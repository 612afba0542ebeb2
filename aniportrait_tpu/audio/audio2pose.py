"""Audio2Pose: autoregressive head-pose generator (flax, nn.scan).

Parity target: reference ``src/audio_models/pose_model.py`` — wav2vec2
memory -> ``in_fn`` -> 8-layer, 8-head post-norm transformer decoder
(d=512, ff=1024, relu) decoded one frame at a time with
  * an ALiBi-style biased causal self-attention mask
    (``init_biased_mask`` pose_model.py:11-32, period=1:
    bias[h, i, j] = -slope_h * (i - j), slopes 0.5**(h+1) for 8 heads),
  * a diagonal-only encoder-decoder memory mask (``enc_dec_mask``
    pose_model.py:35-39) — each pose frame attends solely to its own audio
    frame, which reduces cross-attention to ``out_proj(v_proj(memory_i))``
    (softmax over a single key is 1; q/k projections cancel),
  * a 100-way speaker embedding added to every decoder input
    (pose_model.py:94,107,117).

The reference re-runs the full decoder per emitted frame (O(T^3),
pose_model.py:110-123); because the masks are strictly causal the per-
position outputs are iteration-invariant, so this implementation uses an
exact KV-cached ``nn.scan`` (O(T^2)) and produces the same sequence.
Output: 6-DoF per frame (euler xyz degrees + translation).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from aniportrait_tpu.audio.wav2vec2 import Wav2Vec2Model
from aniportrait_tpu.models.embeddings import sinusoidal_positional_encoding

NEG_INF = -1e9


def alibi_slopes(n_head: int) -> np.ndarray:
    """ALiBi slopes (power-of-2 head counts): start * start**i,
    start = 2**(-2**-(log2(n)-3)) — for 8 heads: 0.5**(i+1)."""
    start = 2.0 ** (-(2.0 ** -(np.log2(n_head) - 3)))
    return np.array([start * (start**i) for i in range(n_head)], dtype=np.float32)


class DecoderLayerStep(nn.Module):
    """One torch ``TransformerDecoderLayer`` (post-norm) applied to a single
    new token, with KV caches for self-attention."""

    d_model: int = 512
    heads: int = 8
    dim_ff: int = 1024
    max_len: int = 150
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mem_i, k_cache, v_cache, step):
        """
        Args:
          x: (b, d) current token.  mem_i: (b, d) matching memory frame.
          k_cache/v_cache: (b, max_len, d).  step: scalar int position.
        Returns: (x_out, k_cache, v_cache)
        """
        b, d = x.shape
        h, hd = self.heads, d // self.heads
        max_len = self.max_len

        q = nn.Dense(d, dtype=self.dtype, name="self_q")(x)
        k = nn.Dense(d, dtype=self.dtype, name="self_k")(x)
        v = nn.Dense(d, dtype=self.dtype, name="self_v")(x)
        k_cache = jax.lax.dynamic_update_slice(k_cache, k[:, None, :], (0, step, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v[:, None, :], (0, step, 0))

        qh = q.reshape(b, h, hd)
        kh = k_cache.reshape(b, max_len, h, hd)
        vh = v_cache.reshape(b, max_len, h, hd)
        logits = jnp.einsum("bhd,bjhd->bhj", qh, kh) / np.sqrt(hd)

        j = jnp.arange(max_len)
        slopes = jnp.asarray(alibi_slopes(h))  # (h,)
        dist = (step - j).astype(jnp.float32)  # (max_len,)
        bias = -slopes[:, None] * dist[None, :]  # (h, max_len)
        bias = jnp.where(j[None, :] <= step, bias, NEG_INF)
        logits = logits + bias[None]

        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(qh.dtype)
        attn = jnp.einsum("bhj,bjhd->bhd", probs, vh).reshape(b, d)
        attn = nn.Dense(d, dtype=self.dtype, name="self_out")(attn)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + attn).astype(self.dtype)

        # cross-attention with diagonal memory mask => single-key softmax
        cv = nn.Dense(d, dtype=self.dtype, name="cross_v")(mem_i)
        cross = nn.Dense(d, dtype=self.dtype, name="cross_out")(cv)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x + cross).astype(self.dtype)

        ffh = nn.Dense(self.dim_ff, dtype=self.dtype, name="linear1")(x)
        ffh = nn.relu(ffh)
        ffh = nn.Dense(d, dtype=self.dtype, name="linear2")(ffh)
        x = nn.LayerNorm(epsilon=1e-5, name="norm3")(x + ffh).astype(self.dtype)
        return x, k_cache, v_cache


class ARDecoderStep(nn.Module):
    """One full autoregressive step through the 8-layer stack.

    Scanned over time by ``nn.scan``; carry = (prev_pose, k_caches, v_caches)
    with cache stacks shaped (L, b, max_len, d).
    """

    out_dim: int = 6
    d_model: int = 512
    num_layers: int = 8
    heads: int = 8
    max_len: int = 150
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, xs):
        prev_pose, k_caches, v_caches, id_emb = carry
        step, mem_i, pe_i = xs

        pose_map = nn.Dense(self.d_model, dtype=self.dtype, name="pose_map")
        emb = pose_map(prev_pose)
        x = emb + pe_i.astype(self.dtype) + id_emb

        new_k, new_v = [], []
        for li in range(self.num_layers):
            layer = DecoderLayerStep(
                self.d_model,
                self.heads,
                2 * self.d_model,
                self.max_len,
                dtype=self.dtype,
                name=f"layer_{li}",
            )
            x, kc, vc = layer(x, mem_i, k_caches[li], v_caches[li], step)
            new_k.append(kc)
            new_v.append(vc)

        out = nn.Dense(self.out_dim, dtype=self.dtype, name="pose_map_r")(x)
        carry = (out, jnp.stack(new_k), jnp.stack(new_v), id_emb)
        return carry, out


class Audio2PoseModel(nn.Module):
    out_dim: int = 6
    latent_dim: int = 512
    num_layers: int = 8
    heads: int = 8
    num_ids: int = 100
    pe_max_len: int = 600
    only_last_features: bool = True
    # wav2vec2 encoder config (defaults = wav2vec2-base-960h)
    hidden: int = 768
    enc_layers: int = 12
    enc_heads: int = 12
    intermediate: int = 3072
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    conv_layers: tuple = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: jnp.ndarray, seq_len: int, id_seed: jnp.ndarray):
        """
        Args:
          wav: (b, n_samples) normalised audio.
          seq_len: static number of output frames.
          id_seed: (b,) int32 speaker-style id in [0, 100).
        Returns: (b, seq_len, 6) pose sequence.
        """
        from aniportrait_tpu.audio.wav2vec2 import CONV_LAYERS

        b = wav.shape[0]
        d = self.latent_dim

        last, all_states = Wav2Vec2Model(
            hidden=self.hidden,
            layers=self.enc_layers,
            heads=self.enc_heads,
            intermediate=self.intermediate,
            pos_conv_kernel=self.pos_conv_kernel,
            pos_conv_groups=self.pos_conv_groups,
            conv_layers=self.conv_layers or CONV_LAYERS,
            dtype=self.dtype,
            name="audio_encoder",
        )(wav, seq_len, output_hidden_states=not self.only_last_features)
        hidden = last if self.only_last_features else sum(all_states) / len(all_states)
        memory = nn.Dense(d, dtype=self.dtype, name="in_fn")(hidden)  # (b, T, d)

        id_emb = nn.Embed(self.num_ids, d, name="id_embed")(id_seed)  # (b, d)
        id_emb = id_emb.astype(self.dtype)
        pe = jnp.asarray(sinusoidal_positional_encoding(self.pe_max_len, d)[0])

        carry0 = (
            jnp.zeros((b, self.out_dim), self.dtype),
            jnp.zeros((self.num_layers, b, seq_len, d), self.dtype),
            jnp.zeros((self.num_layers, b, seq_len, d), self.dtype),
            id_emb,
        )
        xs = (
            jnp.arange(seq_len, dtype=jnp.int32),
            memory.transpose(1, 0, 2),  # (T, b, d)
            pe[:seq_len],  # (T, d)
        )

        scanned = nn.scan(
            ARDecoderStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )(
            out_dim=self.out_dim,
            d_model=d,
            num_layers=self.num_layers,
            heads=self.heads,
            max_len=seq_len,
            dtype=self.dtype,
            name="decoder",
        )
        _, outs = scanned(carry0, xs)  # outs: (T, b, 6)
        return outs.transpose(1, 0, 2)
