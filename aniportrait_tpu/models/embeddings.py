"""Timestep / positional embeddings (pure JAX + flax).

Parity targets: diffusers ``Timesteps``/``TimestepEmbedding`` used at
reference ``src/models/unet_3d.py:95-98``, and the motion module's
interleaved sinusoidal ``PositionalEncoding``
(reference ``src/models/motion_module.py:262-277``).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
import flax.linen as nn


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding, diffusers ``get_timestep_embedding``
    semantics: ``cat([sin, cos])`` then optionally flipped to ``[cos, sin]``.

    Args:
      timesteps: (b,) int/float array.
      dim: embedding dimension (even).
    Returns: (b, dim) float32.
    """
    half_dim = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


class TimestepEmbedding(nn.Module):
    """MLP on the sinusoidal embedding: Linear -> SiLU -> Linear.

    Torch param names: ``linear_1``, ``linear_2``.
    """

    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_2")(x)
        return x


def sinusoidal_positional_encoding(max_len: int, d_model: int) -> np.ndarray:
    """Interleaved sin/cos table ``(1, max_len, d_model)`` — the motion
    module's temporal PE (reference motion_module.py:262-277; NOT the same
    layout as :func:`timestep_embedding`)."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * (-math.log(10000.0) / d_model)
    )
    pe = np.zeros((1, max_len, d_model), dtype=np.float32)
    pe[0, :, 0::2] = np.sin(position * div_term)
    pe[0, :, 1::2] = np.cos(position * div_term)
    return pe
