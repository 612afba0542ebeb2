"""Attention compute kernels.

Single entry point :func:`scaled_dot_product_attention` so the implementation
can be swapped (XLA fused attention today, Pallas flash attention for the
big reference-KV spatial attention).  Replaces the reference's
xformers/torch-SDPA path (reference ``src/models/attention.py`` +
``train_stage_1.py:342-349``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


FLASH_MIN_LOGITS = 1 << 21  # sq * skv above which logits must not hit HBM


def _impl_override() -> str:
    # benchmarking/debug knob: force 'xla' or 'naive' regardless of size
    return os.environ.get("ANIPORTRAIT_ATTN_IMPL", "auto")


def _on_accelerator() -> bool:
    return jax.default_backend() not in ("cpu",)


def scaled_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    impl: str = "auto",
    kv_split: int | None = None,
    drop_tail: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Multi-head attention over ``(batch, seq, heads, head_dim)`` tensors.

    Args:
      q: (B, Sq, H, D);  k/v: (B, Skv, H, D).
      bias: optional additive logits bias broadcastable to (B, H, Sq, Skv).
      kv_split / drop_tail: reference-KV mode — KV is
        ``concat([self (kv_split), bank])`` and rows with ``drop_tail`` must
        ignore the bank.  On TPU at large sizes this dispatches to the
        Pallas flash kernel as two calls + per-row select (the XLA path
        would materialise (B, H, Sq, Skv) f32 logits — tens of GB at 64x64).
    Returns: (B, Sq, H, D), in q.dtype.
    """
    # blocked flash kernel (online softmax over KV chunks); head dims > 256
    # (the VAE's 512-dim single-head attention) stay on XLA
    if impl == "auto":
        impl = _impl_override()
    big = q.shape[1] * k.shape[1] >= FLASH_MIN_LOGITS and q.shape[-1] <= 256
    if impl == "auto" and big and _on_accelerator():
        from aniportrait_tpu.ops.pallas_attention import flash_attention

        if kv_split is not None and drop_tail is not None:
            # bank-drop fused into the kernel mask: ONE pass (the old path
            # dispatched concat + self-only and selected — 2x the FLOPs)
            return flash_attention(q, k, v, drop_tail=drop_tail, kv_split=kv_split)
        if bias is None:
            return flash_attention(q, k, v)
        # biased big attention falls through to XLA

    if impl == "naive":
        scale = q.shape[-1] ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        if bias is not None:
            logits = logits + bias
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v)

    # XLA fused attention (BSHD, handles scaling); build the drop-bank bias
    # here when the flash path didn't take the kv_split contract.
    if kv_split is not None and drop_tail is not None and bias is None:
        skv = k.shape[1]
        is_bank = jnp.arange(skv) >= kv_split
        bias = jnp.where(
            drop_tail.astype(bool)[:, None, None, None]
            & is_bank[None, None, None, :],
            -1e9,
            0.0,
        ).astype(q.dtype)
    return jax.nn.dot_product_attention(q, k, v, bias=bias)
