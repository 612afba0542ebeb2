"""Pallas TPU attention kernels.

``flash_attention`` — memory-efficient multi-head attention used for the
denoising UNet's big spatial self-attention with concatenated reference KV
(SURVEY §3.2: 4096 queries x 8192 KV at 64x64).  The XLA path materialises
the full (rows, heads, 4096, 8192) f32 logits (~32 GB at CFG batch 32 —
exceeds HBM); this kernel keeps each q-block's logits in VMEM.

Layout: heads are folded into the grid's row axis; blocks are
(q_block, head_dim_padded) — last two dims tile-aligned.  Head dim is
zero-padded to 128 lanes (SD-1.5 head dims are 40/80/160); softmax scale
uses the TRUE head dim.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _flash_kernel(scale, q_ref, k_ref, v_ref, o_ref):
    # K/V stay in their storage dtype (bf16 in production): the MXU takes
    # bf16 inputs with f32 accumulation natively, and skipping the f32
    # up-cast halves VMEM so q-blocks can be larger.
    q = q_ref[0]  # (bq, dp)
    k = k_ref[0]  # (S_kv, dp)
    v = v_ref[0]

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, S_kv) f32
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    out = (
        jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        / denom
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _pad_head(x, dp):
    d = x.shape[-1]
    if d == dp:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, dp - d)]
    return jnp.pad(x, pad)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 192,  # 256 overflows the 16MB scoped VMEM by ~0.1MB at Skv=8192
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-head attention over (B, Sq, H, D); K/V (B, Skv, H, D).
    Whole KV rows stay resident in VMEM (fine for Skv <= ~16k at D<=128);
    per-q-block logits never touch HBM."""
    b, sq, h, d = q.shape
    skv = k.shape[1]
    scale = 1.0 / math.sqrt(d)
    dp = max(128, ((d + 127) // 128) * 128)

    # (B, S, H, D) -> (B*H, S, Dp)
    def fold(x, s):
        return _pad_head(x, dp).transpose(0, 2, 1, 3).reshape(b * h, s, dp)

    qf, kf, vf = fold(q, sq), fold(k, skv), fold(v, skv)

    bq = min(block_q, sq)
    grid = (b * h, pl.cdiv(sq, bq))
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, dp), lambda r, i: (r, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, skv, dp), lambda r, i: (r, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, skv, dp), lambda r, i: (r, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, dp), lambda r, i: (r, i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, dp), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    out = out.reshape(b, h, sq, dp).transpose(0, 2, 1, 3)
    return out[..., :d]


def ref_attention_xla(q, k_self, v_self, k_bank, v_bank, drop_bank, rows_per_batch=1):
    """XLA reference for the bank-concat attention (testing oracle)."""
    bank_k = jnp.repeat(k_bank, rows_per_batch, axis=0)
    bank_v = jnp.repeat(v_bank, rows_per_batch, axis=0)
    k = jnp.concatenate([k_self, bank_k], axis=1)
    v = jnp.concatenate([v_self, bank_v], axis=1)
    s, l = k_self.shape[1], k_bank.shape[1]
    is_bank = jnp.concatenate([jnp.zeros((s,), bool), jnp.ones((l,), bool)])
    bias = jnp.where(
        drop_bank[:, None, None, None].astype(bool) & is_bank[None, None, None, :],
        NEG_INF,
        0.0,
    )
    return jax.nn.dot_product_attention(q, k, v, bias=bias)


def ref_flash_attention(
    q, k_self, v_self, k_bank, v_bank, drop_bank,
    rows_per_batch: int = 1, block_q: int = 128, interpret: bool = False,
):
    """Reference-KV attention via two flash calls + per-row select.

    Rows with ``drop_bank`` use self-only attention; others attend to
    ``concat([self, bank])`` — the same computation the reference performs
    (mutual_self_attention.py:147-186 runs the concat pass for all rows and
    re-runs dropped rows self-only).
    """
    bank_k = jnp.repeat(k_bank, rows_per_batch, axis=0)
    bank_v = jnp.repeat(v_bank, rows_per_batch, axis=0)
    k_cat = jnp.concatenate([k_self, bank_k], axis=1)
    v_cat = jnp.concatenate([v_self, bank_v], axis=1)
    out_cat = flash_attention(q, k_cat, v_cat, block_q=block_q, interpret=interpret)
    out_self = flash_attention(q, k_self, v_self, block_q=block_q, interpret=interpret)
    drop = drop_bank.astype(bool)[:, None, None, None]
    return jnp.where(drop, out_self, out_cat)
