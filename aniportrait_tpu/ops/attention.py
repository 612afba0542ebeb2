"""Attention compute kernels.

Single entry point :func:`scaled_dot_product_attention` so the implementation
can be swapped (XLA fused attention today, Pallas flash attention for the
big reference-KV spatial attention).  Replaces the reference's
xformers/torch-SDPA path (reference ``src/models/attention.py`` +
``train_stage_1.py:342-349``).
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp


# sq * skv above which the flash kernel beats XLA's materialised-logits
# attention (measured on v5e: 1024q/1024kv XLA 1.54 ms vs flash 0.51 ms;
# 256q/512kv XLA wins) — also the level above which logits must not hit HBM
FLASH_MIN_LOGITS = 1 << 20
SMALL_SEQ_MAX = 32  # seq length at/below which the packed small-seq path wins
SMALL_SEQ_MIN_ROWS = 1024  # batch*heads needed to amortise the packing


def _impl_override() -> str:
    # benchmarking/debug knob: force 'xla' or 'naive' regardless of size
    return os.environ.get("ANIPORTRAIT_ATTN_IMPL", "auto")


def small_seq_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, impl: str = "auto"
) -> jnp.ndarray:
    """Self-attention for MANY short sequences (the motion module's temporal
    attention: ~65k independent rows of seq<=16, head_dim 40).

    A batched matmul with M=N=16, K=40 runs at ~0.01% of MXU peak (every
    tiny dot pads to the 128-lane tile).  Instead, pack G = 128//S sequences
    into one 128-row tile, compute the full (128, 128) cross-product logits
    in ONE well-shaped matmul, add a static block-diagonal mask (off-block
    = -1e9, so softmax over the packed axis equals the per-sequence softmax
    exactly), and apply the dense (128, 128) @ (128, D) PV matmul.  ~2x
    FLOP overhead instead of ~100x tile waste.

    On TPU the per-tile compute runs as a Pallas kernel (one grid step per
    tile, logits in VMEM); elsewhere the same packing goes through XLA
    batched matmuls.

    q/k/v: (B, S, H, D) with q==k==v sequence length.  Returns (B, S, H, D).
    """
    b, s, h, d = q.shape
    c = h * d
    scale = jnp.asarray(d ** -0.5, q.dtype)
    g = max(1, 128 // s)  # sequences per 128-row tile

    use_pallas = impl == "pallas" or (impl == "auto" and _on_accelerator())
    if use_pallas:
        # Contiguous-sequence packing: tiles are a plain reshape of the
        # (B, S, C) token tensor (the inverse of the caller's head reshape,
        # so the whole pack is transpose-free in HBM); heads are attended
        # independently inside the kernel.  The old head-fold pack spent
        # ~4 x 0.8 ms of pure HBM transpose copies per 64x64 attention call.
        from aniportrait_tpu.ops.pallas_attention import ctg_packed

        # base-2 softmax contract (see _ctg_kernel): the log2e-folded scale
        # multiplies q INSIDE the kernel — a caller-side multiply cannot
        # fuse into the Pallas custom call (one extra HBM pass over q)
        qs = q.reshape(b, s, c)
        ks = k.reshape(b, s, c)
        vs = v.reshape(b, s, c)
        pad_b = (-b) % g
        if pad_b:  # dead sequences attend among themselves; sliced away
            qs = jnp.pad(qs, ((0, pad_b), (0, 0), (0, 0)))
            ks = jnp.pad(ks, ((0, pad_b), (0, 0), (0, 0)))
            vs = jnp.pad(vs, ((0, pad_b), (0, 0), (0, 0)))
        n = qs.shape[0] // g
        out = ctg_packed(
            qs.reshape(n, g * s, c),
            ks.reshape(n, g * s, c),
            vs.reshape(n, g * s, c),
            s, h, interpret_default(),
            float(d ** -0.5) * math.log2(math.e),
        )
        return (
            out.reshape(n * g, s, c)[:b].astype(q.dtype).reshape(b, s, h, d)
        )

    def fold(x):  # (B, S, H, D) -> (B*H, S, D)
        return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)

    qf, kf, vf = fold(q) * scale, fold(k), fold(v)
    rows = b * h
    pad = (-rows) % g
    if pad:
        qf = jnp.pad(qf, ((0, pad), (0, 0), (0, 0)))
        kf = jnp.pad(kf, ((0, pad), (0, 0), (0, 0)))
        vf = jnp.pad(vf, ((0, pad), (0, 0), (0, 0)))
    n = qf.shape[0] // g
    qp = qf.reshape(n, g * s, d)
    kp = kf.reshape(n, g * s, d)
    vp = vf.reshape(n, g * s, d)
    # static block-diagonal mask: row i attends col j iff same sequence
    blk = jnp.arange(g * s) // s
    mask = jnp.where(blk[:, None] == blk[None, :], 0.0, -1e9).astype(
        jnp.float32
    )
    logits = jax.lax.dot_general(
        qp, kp, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (n, g*s, g*s)
    probs = jax.nn.softmax(logits + mask, axis=-1).astype(v.dtype)
    out = jax.lax.dot_general(
        probs, vp, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)  # (n, g*s, d)

    out = out.reshape(n * g, s, d)[:rows].astype(q.dtype)
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3)


def _force_pallas() -> bool:
    # test/dryrun knob: dispatch the Pallas kernels in interpret mode on
    # the CPU backend, so the KERNEL path (not the XLA fallback) can be
    # exercised under the virtual multi-device mesh without TPU hardware
    return os.environ.get("ANIPORTRAIT_FORCE_PALLAS", "") == "interpret"


def _on_accelerator() -> bool:
    return jax.default_backend() not in ("cpu",) or _force_pallas()


def interpret_default() -> bool:
    """interpret= flag the kernel dispatches should pass through: whenever
    a Pallas kernel is about to run on the CPU backend (forced dispatch or
    an explicit impl='pallas'), it must run in interpret mode."""
    return jax.default_backend() in ("cpu",)


def temporal_attention_4d(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, heads: int
) -> jnp.ndarray:
    """Temporal self-attention over (b, f, s, c) activations in NATURAL
    layout — sequences run along the frame axis per spatial position, and
    on TPU the kernel reads the activation exactly as the surrounding
    convs/Dense layers produce it (no (b,f,s,c)->(b*s,f,c) transpose; that
    transpose was materialised once per consumer, ~0.5 s/clip of copies).
    """
    b, f, s, c = q.shape
    d = c // heads
    # P spatial positions packed per kernel tile: the largest power of two
    # with f*P <= 128 (power of two so it divides the spatial extent; tiles
    # under-fill 128 rows when 128 % f != 0, e.g. f=24 -> P=4, 96 rows —
    # still far cheaper than the transpose fallback below)
    P = 1 << int(math.log2(128 // f)) if 2 <= f <= 64 else 0
    if P and s % P == 0 and _on_accelerator():
        from aniportrait_tpu.ops.pallas_attention import nat_packed

        # base-2 softmax contract: log2(e) x softmax scale multiplies q
        # INSIDE the kernel (a caller-side multiply cannot fuse into the
        # Pallas custom call — it was a full HBM pass over q per call,
        # ~75 ms/clip of copies in the r4 trace)
        out = nat_packed(
            q.reshape(b * f, s, c),
            k.reshape(b * f, s, c),
            v.reshape(b * f, s, c),
            f, heads, interpret_default(),
            math.log2(math.e) * float(d) ** -0.5,
        )
        return out.reshape(b, f, s, c)
    # fallback (CPU tests, odd frame counts): token layout through the
    # generic dispatch
    def tok(x):
        return x.transpose(0, 2, 1, 3).reshape(b * s, f, heads, d)

    out = scaled_dot_product_attention(tok(q), tok(k), tok(v))
    return out.reshape(b, s, f, c).transpose(0, 2, 1, 3)


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
    # single-KV-token cross attention (the CLIP image embed is 1 token):
    # softmax over one logit is 1, so the output is exactly V broadcast —
    # no logits, no softmax, no matmuls
    if impl == "auto" and bias is None and kv_split is None and k.shape[1] == 1:
        return jnp.broadcast_to(
            v, (q.shape[0], q.shape[1]) + v.shape[2:]
        ).astype(q.dtype)
    # many-tiny-sequences self-attention (temporal/motion): packed path
    if (
        impl == "auto"
        and bias is None
        and kv_split is None
        and q.shape[1] == k.shape[1] <= SMALL_SEQ_MAX
        and q.shape[0] * q.shape[2] >= SMALL_SEQ_MIN_ROWS
        and q.shape[1] >= 2
    ):
        return small_seq_attention(q, k, v)
    big = q.shape[1] * k.shape[1] >= FLASH_MIN_LOGITS and q.shape[-1] <= 256
    if impl == "auto" and big and _on_accelerator():
        from aniportrait_tpu.ops.pallas_attention import flash_attention

        if kv_split is not None and drop_tail is not None:
            # bank-drop fused into the kernel mask: ONE pass (the old path
            # dispatched concat + self-only and selected — 2x the FLOPs)
            return flash_attention(
                q, k, v, drop_tail=drop_tail, kv_split=kv_split,
                interpret=interpret_default(),
            )
        if bias is None:
            return flash_attention(q, k, v, interpret=interpret_default())
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
