"""Audio2Mesh: wav2vec2 features -> per-frame 3D mesh vertex offsets.

Parity target: reference ``src/audio_models/model.py`` — wav2vec2-base
(frozen conv extractor) -> Linear(768->512) -> zero-init Linear(512->1404)
(= 468 vertices x 3).  With ``only_last_features=False`` the encoder hidden
states of all layers are averaged (model.py:50-51); the shipped config uses
``only_last_fetures: True`` (configs/inference/inference_audio.yaml:5).
Output offsets are added to the reference face's neutral ``lmks3d``
(scripts/audio2vid.py:162-165).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from aniportrait_tpu.audio.wav2vec2 import Wav2Vec2Model


class Audio2MeshModel(nn.Module):
    out_dim: int = 1404
    latent_dim: int = 512
    only_last_features: bool = True
    # wav2vec2 encoder config (defaults = wav2vec2-base-960h)
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    conv_layers: tuple = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: jnp.ndarray, seq_len: int):
        """wav: (b, n_samples) -> (b, seq_len, out_dim) vertex offsets."""
        from aniportrait_tpu.audio.wav2vec2 import CONV_LAYERS

        last, all_states = Wav2Vec2Model(
            hidden=self.hidden,
            layers=self.layers,
            heads=self.heads,
            intermediate=self.intermediate,
            pos_conv_kernel=self.pos_conv_kernel,
            pos_conv_groups=self.pos_conv_groups,
            conv_layers=self.conv_layers or CONV_LAYERS,
            dtype=self.dtype,
            name="audio_encoder",
        )(wav, seq_len, output_hidden_states=not self.only_last_features)
        h = last if self.only_last_features else sum(all_states) / len(all_states)
        h = nn.Dense(self.latent_dim, dtype=self.dtype, name="in_fn")(h)
        return nn.Dense(
            self.out_dim,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="out_fn",
        )(h)
