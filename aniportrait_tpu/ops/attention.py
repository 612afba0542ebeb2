"""Attention compute kernels.

Single entry point :func:`scaled_dot_product_attention` so the implementation
can be swapped (XLA fused attention today, Pallas flash attention for the
big reference-KV spatial attention).  Replaces the reference's
xformers/torch-SDPA path (reference ``src/models/attention.py`` +
``train_stage_1.py:342-349``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def scaled_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    impl: str = "xla",
) -> jnp.ndarray:
    """Multi-head attention over ``(batch, seq, heads, head_dim)`` tensors.

    Args:
      q: (B, Sq, H, D)
      k/v: (B, Skv, H, D)
      bias: optional additive logits bias broadcastable to (B, H, Sq, Skv).
    Returns: (B, Sq, H, D), in q.dtype.
    """
    if impl == "xla":
        # jax.nn.dot_product_attention expects BSHD and handles scaling.
        return jax.nn.dot_product_attention(q, k, v, bias=bias)
    if impl == "naive":
        scale = q.shape[-1] ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        if bias is not None:
            logits = logits + bias
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    raise ValueError(f"unknown attention impl: {impl}")
