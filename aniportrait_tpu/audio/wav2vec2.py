"""wav2vec2-base-960h encoder in flax, with the reference's time-resampling
modification.

Parity targets: HF ``Wav2Vec2Model`` (base config: do_stable_layer_norm=False,
conv_bias=False) + the reference's change (``src/audio_models/wav2vec2.py:30-32``,
``torch_utils.py:16-19``): after the conv feature extractor, features are
linearly interpolated (align_corners=True) along time to exactly ``seq_len``
video frames, so ~49.9 Hz wav2vec frames match the target fps.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from aniportrait_tpu.ops.attention import scaled_dot_product_attention

# (out_channels, kernel, stride) — wav2vec2-base feature extractor
CONV_LAYERS: Sequence[Tuple[int, int, int]] = (
    (512, 10, 5),
    (512, 3, 2),
    (512, 3, 2),
    (512, 3, 2),
    (512, 3, 2),
    (512, 2, 2),
    (512, 2, 2),
)


def linear_interpolation(x: jnp.ndarray, seq_len: int) -> jnp.ndarray:
    """Resample (b, t, c) along t with align_corners=True linear interp
    (matches reference torch_utils.py:16-19)."""
    b, t, c = x.shape
    if t == seq_len:
        return x
    if seq_len == 1:
        return x[:, :1]
    pos = jnp.arange(seq_len, dtype=jnp.float32) * ((t - 1) / (seq_len - 1))
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, t - 1)
    hi = jnp.clip(lo + 1, 0, t - 1)
    w = (pos - lo.astype(jnp.float32))[None, :, None]
    return x[:, lo] * (1.0 - w) + x[:, hi] * w


class FeatureExtractor(nn.Module):
    """7-layer conv feature extractor (GroupNorm on layer 0, gelu)."""

    conv_layers: Sequence[Tuple[int, int, int]] = CONV_LAYERS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav):
        """wav: (b, n_samples) -> (b, t, 512)"""
        x = wav[:, :, None].astype(self.dtype)  # (b, n, 1)
        for i, (c, k, s) in enumerate(self.conv_layers):
            x = nn.Conv(
                c,
                (k,),
                strides=(s,),
                padding="VALID",
                use_bias=False,
                dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            if i == 0:
                # torch GroupNorm(num_groups=512, channels=512) == per-channel
                # instance norm over time
                scale = self.param("gn_scale", nn.initializers.ones, (c,), jnp.float32)
                bias = self.param("gn_bias", nn.initializers.zeros, (c,), jnp.float32)
                xf = x.astype(jnp.float32)
                mean = xf.mean(axis=1, keepdims=True)
                var = xf.var(axis=1, keepdims=True)
                x = ((xf - mean) / jnp.sqrt(var + 1e-5) * scale + bias).astype(
                    self.dtype
                )
            x = nn.gelu(x, approximate=False)
        return x


class EncoderLayer(nn.Module):
    """Post-norm transformer layer (do_stable_layer_norm=False)."""

    hidden: int = 768
    heads: int = 12
    intermediate: int = 3072
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, s, c = x.shape
        d = c // self.heads
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(x).reshape(b, s, self.heads, d)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(x).reshape(b, s, self.heads, d)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(x).reshape(b, s, self.heads, d)
        a = scaled_dot_product_attention(q, k, v).reshape(b, s, c)
        x = x + nn.Dense(c, dtype=self.dtype, name="out_proj")(a)
        x = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x).astype(self.dtype)

        h = nn.Dense(self.intermediate, dtype=self.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c, dtype=self.dtype, name="fc2")(h)
        x = x + h
        return nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x).astype(self.dtype)


class Wav2Vec2Model(nn.Module):
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    conv_layers: Sequence[Tuple[int, int, int]] = CONV_LAYERS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        wav: jnp.ndarray,
        seq_len: int,
        output_hidden_states: bool = False,
    ):
        """wav: (b, n_samples) normalised audio.
        Returns (last_hidden_state, hidden_states tuple or None);
        time axis resampled to ``seq_len``."""
        feats = FeatureExtractor(
            self.conv_layers, dtype=self.dtype, name="feature_extractor"
        )(wav)
        feats = linear_interpolation(feats, seq_len)

        # feature projection: LayerNorm(512) -> Dense(768)
        h = nn.LayerNorm(epsilon=1e-5, name="fp_layer_norm")(feats).astype(self.dtype)
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fp_projection")(h)

        # positional conv embedding: grouped conv k=128, pad 64, drop last step
        pos = nn.Conv(
            self.hidden,
            (self.pos_conv_kernel,),
            padding=self.pos_conv_kernel // 2,
            feature_group_count=self.pos_conv_groups,
            dtype=self.dtype,
            name="pos_conv",
        )(h)
        pos = pos[:, : h.shape[1], :]  # even kernel: trim the extra frame
        pos = nn.gelu(pos, approximate=False)
        h = h + pos
        h = nn.LayerNorm(epsilon=1e-5, name="encoder_layer_norm")(h).astype(self.dtype)

        all_states = [h] if output_hidden_states else None
        for i in range(self.layers):
            h = EncoderLayer(
                self.hidden, self.heads, self.intermediate, dtype=self.dtype,
                name=f"layer_{i}",
            )(h)
            if output_hidden_states:
                all_states.append(h)
        return h, (tuple(all_states) if output_hidden_states else None)
