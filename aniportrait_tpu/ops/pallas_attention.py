"""Pallas TPU kernel for reference-KV spatial attention.

The hot attention in the denoising UNet (SURVEY §3.2: seq 4096 queries
against 4096 self + 4096 reference-bank KV at 64x64) concatenates the
ReferenceNet bank into K/V *per frame* — the XLA path materialises the bank
repeated over frames ((B*F, L, C) HBM traffic per layer).  This kernel reads
the bank once per batch row directly from HBM (index_map ``row // F``) and
applies the CFG drop-bank mask in-register, so no repeated/concatenated KV
is ever written.

Layout: q/k/v are (R, S, H, D) with D zero-padded to a multiple of 128
(lane width); the softmax scale uses the TRUE head dim.  Each grid cell
(row, head, q-block) computes full attention for its q block with the whole
KV row resident in VMEM (<= 4 MB per tensor at S=4096, D<=128).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _kernel(scale, drop_ref, q_ref, ks_ref, vs_ref, kb_ref, vb_ref, o_ref):
    q = q_ref[0, :, 0, :].astype(jnp.float32)  # (BQ, D)
    ks = ks_ref[0, :, 0, :].astype(jnp.float32)  # (S, D)
    vs = vs_ref[0, :, 0, :].astype(jnp.float32)
    kb = kb_ref[0, :, 0, :].astype(jnp.float32)  # (L, D)
    vb = vb_ref[0, :, 0, :].astype(jnp.float32)

    ls = jax.lax.dot_general(
        q, ks, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, S)
    lb = jax.lax.dot_general(
        q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, L)

    drop = drop_ref[0]  # int32: 1 => this row ignores the bank
    lb = lb + drop.astype(jnp.float32) * NEG_INF

    m = jnp.maximum(
        jnp.max(ls, axis=1, keepdims=True), jnp.max(lb, axis=1, keepdims=True)
    )
    ps = jnp.exp(ls - m)
    pb = jnp.exp(lb - m)
    denom = jnp.sum(ps, axis=1, keepdims=True) + jnp.sum(pb, axis=1, keepdims=True)

    out = (
        jnp.dot(ps, vs, preferred_element_type=jnp.float32)
        + jnp.dot(pb, vb, preferred_element_type=jnp.float32)
    ) / denom
    o_ref[0, :, 0, :] = out.astype(o_ref.dtype)


def _pad_head(x, dp):
    d = x.shape[-1]
    if d == dp:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, dp - d)]
    return jnp.pad(x, pad)


@functools.partial(jax.jit, static_argnames=("rows_per_batch", "block_q", "interpret"))
def ref_flash_attention(
    q: jnp.ndarray,
    k_self: jnp.ndarray,
    v_self: jnp.ndarray,
    k_bank: jnp.ndarray,
    v_bank: jnp.ndarray,
    drop_bank: jnp.ndarray,
    rows_per_batch: int = 1,
    block_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """
    Args:
      q, k_self, v_self: (R, S, H, D).
      k_bank, v_bank: (B, L, H, D) with R == B * rows_per_batch.
      drop_bank: (R,) int32/bool — rows that must ignore bank tokens.
    Returns: (R, S, H, D) in q.dtype.
    """
    r_, s, h, d = q.shape
    b, l = k_bank.shape[0], k_bank.shape[1]
    assert r_ == b * rows_per_batch

    scale = 1.0 / math.sqrt(d)
    dp = max(128, ((d + 127) // 128) * 128)
    q_p = _pad_head(q, dp)
    ks_p = _pad_head(k_self, dp)
    vs_p = _pad_head(v_self, dp)
    kb_p = _pad_head(k_bank, dp)
    vb_p = _pad_head(v_bank, dp)

    bq = min(block_q, s)
    drop = drop_bank.astype(jnp.int32)

    grid = (r_, h, pl.cdiv(s, bq))
    out = pl.pallas_call(
        functools.partial(_kernel, scale),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1,), lambda r, hh, i: (r,), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (1, bq, 1, dp), lambda r, hh, i: (r, i, hh, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, s, 1, dp), lambda r, hh, i: (r, 0, hh, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, s, 1, dp), lambda r, hh, i: (r, 0, hh, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, l, 1, dp),
                    lambda r, hh, i: (r // rows_per_batch, 0, hh, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, l, 1, dp),
                    lambda r, hh, i: (r // rows_per_batch, 0, hh, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, bq, 1, dp), lambda r, hh, i: (r, i, hh, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((r_, s, h, dp), q.dtype),
        interpret=interpret,
    )(drop, q_p, ks_p, vs_p, kb_p, vb_p)
    return out[..., :d]


def ref_attention_xla(q, k_self, v_self, k_bank, v_bank, drop_bank, rows_per_batch=1):
    """XLA reference implementation (used for testing the kernel)."""
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
