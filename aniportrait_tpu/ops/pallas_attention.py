"""Pallas TPU flash-attention kernels.

Used for the denoising UNet's big spatial self-attention with concatenated
reference KV (SURVEY §3.2: 4096 queries x 8192 KV at 64x64) — the role the
reference fills with xformers CUDA kernels (reference ``attention.py:605-722``,
``train_stage_1.py:342-349``).

Design (TPU-first):
  * Online-softmax over KV blocks (classic flash attention): KV streams
    through VMEM in ``block_kv`` chunks; running max / denominator / f32
    accumulator live in VMEM scratch. Nothing of size (Sq, Skv) ever exists.
  * The reference-bank CFG semantics are FUSED into the kernel: rows flagged
    ``drop_tail`` mask out KV columns past ``kv_split`` (the bank tokens), so
    the unconditional CFG half attends self-only in the SAME pass — no
    second dispatch, no (B,H,Sq,Skv) bias tensor
    (reference mutual_self_attention.py:166-186 re-runs dropped rows).
  * Custom VJP with a two-kernel flash backward (dq; dk+dv) so the training
    step never materialises logits either — required for stage-2 16-frame
    512^2 training (16 rows x 8 heads x 4096 x 8192 f32 logits would be
    ~17 GB).
  * Heads fold into the grid's row axis; head_dim pads to the 128-lane
    tile. m/l scratch rows are (block_q, 128) per the TPU min-tile.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aniportrait_tpu.ops.partition import (
    make_partitioned,
    axes_of,
    prod_axes,
    nd_spec,
)
from jax.sharding import NamedSharding

NEG_INF = -1e30  # f32 logits; exp(NEG_INF - m) == 0 exactly


def _mask_block(logits, ki, block_kv, skv, kv_split, drop):
    """Additive mask for one KV block: tail padding + dropped bank columns.

    drop: (1, 1) int32 ref value broadcast over the block (0 or 1).
    """
    bq, bkv = logits.shape
    cols = ki * block_kv + jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1)
    valid = cols < skv
    if kv_split is not None:
        valid = jnp.logical_and(
            valid, jnp.logical_or(drop == 0, cols < kv_split)
        )
    return jnp.where(valid, logits, NEG_INF)


def _fwd_kernel(
    scale, block_kv, skv, kv_split, n_kv, want_lse, need_mask,
    q_ref, k_ref, v_ref, drop_ref,
    o_ref, lse_ref,
    acc_ref, m_ref, l_ref,
):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (bq, dp) storage dtype — MXU takes bf16 with f32 accum
    k = k_ref[0]  # (bkv, dp)
    v = v_ref[0]

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, bkv) f32
    if need_mask:  # static; see _fwd_kernel_nopad
        logits = _mask_block(logits, ki, block_kv, skv, kv_split,
                             drop_ref[pl.program_id(0), 0])

    m_prev = m_ref[:, :1]  # (bq, 1)
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(logits, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ki == n_kv - 1)
    def _():
        l = l_ref[:, :1]
        # fully-masked rows (l == 0) only occur in q padding; emit 0 and set
        # lse = 0 so the backward's exp(logits - lse) stays finite (m is
        # NEG_INF there; m + log(l) would be -inf and exp(0 - -inf) = inf)
        safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / safe).astype(o_ref.dtype)
        if want_lse:  # backward-pass residual only (skipped for inference)
            lse = jnp.where(l == 0.0, 0.0, m_ref[:, :1] + jnp.log(safe))
            lse_ref[0] = jnp.broadcast_to(
                lse, lse_ref.shape[1:]
            ).astype(lse_ref.dtype)


def _dq_kernel(
    scale, block_kv, skv, kv_split, n_kv, need_mask,
    q_ref, k_ref, v_ref, drop_ref, do_ref, lse_ref, delta_ref,
    dq_ref,
    dq_acc_ref,
):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        dq_acc_ref[:] = jnp.zeros_like(dq_acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]  # (bq, dp)
    lse = lse_ref[0][:, :1]  # (bq, 1) f32
    delta = delta_ref[0][:, :1]  # (bq, 1) f32  rowsum(do * o)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if need_mask:  # static; see _fwd_kernel_nopad
        logits = _mask_block(logits, ki, block_kv, skv, kv_split,
                             drop_ref[pl.program_id(0), 0])
    p = jnp.exp(logits - lse)  # (bq, bkv) — masked cols are exactly 0

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bkv)
    ds = p * (dp - delta) * scale
    dq_acc_ref[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == n_kv - 1)
    def _():
        dq_ref[0] = dq_acc_ref[:].astype(dq_ref.dtype)


def _dkv_kernel(
    scale, block_kv, block_q, skv, sq, kv_split, n_q, need_mask, need_qmask,
    q_ref, k_ref, v_ref, drop_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_acc_ref, dv_acc_ref,
):
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _():
        dk_acc_ref[:] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[:] = jnp.zeros_like(dv_acc_ref)

    q = q_ref[0]  # (bq, dp)
    k = k_ref[0]  # (bkv, dp)
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]
    delta = delta_ref[0][:, :1]
    ki = pl.program_id(1)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, bkv)
    if need_mask:  # static; see _fwd_kernel_nopad
        logits = _mask_block(logits, ki, block_kv, skv, kv_split,
                             drop_ref[pl.program_id(0), 0])
    if need_qmask:
        # q-padding rows have lse == log(safe)=0, p = exp(NEG_INF) = 0: harmless
        rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
        logits = jnp.where(rows < sq, logits, NEG_INF)
    p = jnp.exp(logits - lse)

    dv_acc_ref[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bkv, dp)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta) * scale  # (bq, bkv)
    dk_acc_ref[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bkv, dp)

    @pl.when(qi == n_q - 1)
    def _():
        dk_ref[0] = dk_acc_ref[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc_ref[:].astype(dv_ref.dtype)


def _pad_to(x, size, axis):
    cur = x.shape[axis]
    if cur == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, size - cur)
    return jnp.pad(x, pad)


def _fold_heads(x, dp):
    """(B, S, H, D) -> (B*H, S, Dp) with the head dim zero-padded to dp."""
    b, s, h, d = x.shape
    x = _pad_to(x, dp, 3)
    return x.transpose(0, 2, 1, 3).reshape(b * h, s, dp)


def _plan(sq, skv, d, block_q, block_kv):
    dp = max(128, ((d + 127) // 128) * 128)
    bq = min(block_q, max(128, ((sq + 127) // 128) * 128))
    bkv = min(block_kv, max(128, ((skv + 127) // 128) * 128))
    sq_p = ((sq + bq - 1) // bq) * bq
    skv_p = ((skv + bkv - 1) // bkv) * bkv
    return dp, bq, bkv, sq_p, skv_p


def _fwd_kernel_nopad(
    scale, block_kv, skv, kv_split, n_kv, need_mask,
    q_ref, k_ref, v_ref, drop_ref,
    o_ref,
    acc_ref, m_ref, l_ref,
):
    """Forward kernel over head-folded but UNPADDED (B*H, S, D) blocks —
    no 40->128 lane padding in HBM (the trace showed pad+copy around the
    padded kernel costing more than the convolutions; the fold transpose
    itself is cheap).  Mosaic pads the D-lane tiles in VMEM transparently.
    Constraint honored: a block's last dim equals the array's (D), and the
    second-to-last (bq/bkv) is 8-divisible.

    ``need_mask`` is STATIC: when the KV length is block-aligned and there
    is no bank split, the per-block iota/compare/select mask is skipped
    entirely — at head_dim 40 the kernel is VPU-bound (the MXU passes pad
    K 40->128 regardless), so ~4 vector ops per logit are a measurable
    fraction of the whole call."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (bq, d)
    k = k_ref[0]  # (bkv, d)
    v = v_ref[0]

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, bkv) f32
    if need_mask:
        logits = _mask_block(
            logits, ki, block_kv, skv, kv_split, drop_ref[pl.program_id(0), 0]
        )

    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(logits, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ki == n_kv - 1)
    def _():
        l = l_ref[:, :1]
        safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / safe).astype(o_ref.dtype)


def _flash_nopad(q, k, v, drop_rows, kv_split, block_q, block_kv, interpret):
    """Inference forward: head-folded, lane-unpadded blocks."""
    b, sq, h, d = q.shape
    skv = k.shape[1]
    scale = 1.0 / math.sqrt(d)
    bq = min(block_q, max(128, ((sq + 127) // 128) * 128))
    bkv = min(block_kv, max(128, ((skv + 127) // 128) * 128))
    sq_p = ((sq + bq - 1) // bq) * bq
    skv_p = ((skv + bkv - 1) // bkv) * bkv
    n_q, n_kv = sq_p // bq, skv_p // bkv

    def fold(x, s, s_p):  # (B, S, H, D) -> (B*H, S_p, D), no lane pad
        return _pad_to(x.transpose(0, 2, 1, 3).reshape(b * h, s, d), s_p, 1)

    qp = fold(q, sq, sq_p)
    kp = fold(k, skv, skv_p)
    vp = fold(v, skv, skv_p)
    rows = b * h
    drop = jnp.repeat(drop_rows.astype(jnp.int32), h)[:, None]  # (rows, 1)

    need_mask = kv_split is not None or skv_p != skv
    kernel = functools.partial(
        _fwd_kernel_nopad, scale, bkv, skv, kv_split, n_kv, need_mask
    )
    out = pl.pallas_call(
        kernel,
        grid=(rows, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda r, qi, ki: (r, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, d), lambda r, qi, ki: (r, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, d), lambda r, qi, ki: (r, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda r, qi, ki: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda r, qi, ki: (r, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, sq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, drop)
    return out.reshape(b, h, sq_p, d)[:, :, :sq].transpose(0, 2, 1, 3)


# mesh dispatch: rows (batch) may shard, seq/head/depth replicated — each
# shard runs the identical kernel on its local rows (see ops/partition.py)
_p_flash_nopad = make_partitioned(
    "flash_nopad",
    _flash_nopad,
    rule="b sq h d, b skv h d, b skv h d, b -> b sq h d",
    n_static=4,
    need_replication=("sq", "skv", "h", "d"),
    batch_dims=(0, 0, 0, 0),
)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7)
)
def _flash(q, k, v, drop_rows, kv_split, block_q, block_kv, interpret):
    # primal-only call (inference): native-layout kernel, no LSE residual,
    # no head-fold/pad HBM traffic
    return _p_flash_nopad(
        q, k, v, drop_rows, kv_split, block_q, block_kv, interpret
    )


def _flash_fwd_impl(q, k, v, drop_rows, kv_split, block_q, block_kv, interpret,
                    want_lse=True):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    scale = 1.0 / math.sqrt(d)
    dp, bq, bkv, sq_p, skv_p = _plan(sq, skv, d, block_q, block_kv)
    n_q, n_kv = sq_p // bq, skv_p // bkv

    qf = _pad_to(_fold_heads(q, dp), sq_p, 1)
    kf = _pad_to(_fold_heads(k, dp), skv_p, 1)
    vf = _pad_to(_fold_heads(v, dp), skv_p, 1)
    rows = b * h
    drop = jnp.repeat(drop_rows.astype(jnp.int32), h)[:, None]  # (rows, 1)

    kernel = functools.partial(
        _fwd_kernel, scale, bkv, skv, kv_split, n_kv, want_lse,
        kv_split is not None or skv_p != skv,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(rows, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda r, qi, ki: (r, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, dp), lambda r, qi, ki: (r, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, dp), lambda r, qi, ki: (r, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda r, qi, ki: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, dp), lambda r, qi, ki: (r, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 128), lambda r, qi, ki: (r, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, sq_p, dp), q.dtype),
            jax.ShapeDtypeStruct((rows, sq_p, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, dp), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf, drop)
    out_bshd = (
        out.reshape(b, h, sq_p, dp)[:, :, :sq, :d].transpose(0, 2, 1, 3)
    )
    return out_bshd, (qf, kf, vf, drop, out, lse)


# training forward: out shards like q; the folded residuals' (b*h) row
# axis shards by the same mesh axes as b (h stays whole per shard — the
# fold is b-major/h-minor, matching the compound factor ``(b h)``).
# Shardy rejects compound factors containing a size-1 factor, so the rule
# degenerates when b == 1 (no batch sharding possible) or h == 1.
def _flash_fwd_rule(shapes, kv_split, bq, bkv, interp):
    b, _, h, _ = shapes[0]
    head = "b sq h d, b skv h d, b skv h d, b -> b sq h d, "
    if h == 1:
        res = ("b sqp dp, b kvp dp, b kvp dp, b uno, b sqp dp, b sqp el")
    elif b == 1:
        res = ("rows sqp dp, rows kvp dp, rows kvp dp, rows uno, "
               "rows sqp dp, rows sqp el")
    else:
        res = ("(b h) sqp dp, (b h) kvp dp, (b h) kvp dp, (b h) uno, "
               "(b h) sqp dp, (b h) sqp el")
    return head + res, {}


_p_flash_fwd_impl = make_partitioned(
    "flash_fwd",
    lambda q, k, v, dr, kv_split, bq, bkv, interp: _flash_fwd_impl(
        q, k, v, dr, kv_split, bq, bkv, interp, want_lse=True
    ),
    rule=_flash_fwd_rule,
    n_static=4,
    need_replication=(
        "sq", "skv", "h", "d", "sqp", "kvp", "dp", "uno", "el", "rows",
    ),
    batch_dims=(0, 0, 0, 0),
    out_batch_dims=(0, 0, 0, 0, 0, 0, 0),
)


def _flash_fwd(q, k, v, drop_rows, kv_split, block_q, block_kv, interpret):
    out, res = _p_flash_fwd_impl(
        q, k, v, drop_rows, kv_split, block_q, block_kv, interpret
    )
    return out, (res, q.shape, k.shape[1])


def _flash_bwd_kernels(qf, kf, vf, drop, dof, lse, delta, sq, skv, d,
                       kv_split, block_q, block_kv, interpret):
    """dq then dk+dv flash-backward kernels over folded (rows, S, Dp)
    operands; separated out so the row axis can mesh-partition."""
    scale = 1.0 / math.sqrt(d)
    rows, sq_p, dp = qf.shape
    skv_p = kf.shape[1]
    # backward blocks are capped independently of the forward's: the dq/dkv
    # kernels carry more live buffers (do/lse/delta + two accumulators) and
    # exceed the 16M scoped-VMEM budget at the forward's 1024/2048 blocks
    # inside large programs (stage-2 OOM); 512/1024 measured safe
    bq = min(block_q, sq_p)
    bkv = min(block_kv, skv_p)
    while bq > 512:  # halving keeps sq_p % bq == 0
        bq //= 2
    while bkv > 1024:
        bkv //= 2
    n_q, n_kv = sq_p // bq, skv_p // bkv

    need_mask = kv_split is not None or skv_p != skv
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale, bkv, skv, kv_split, n_kv,
                          need_mask),
        grid=(rows, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda r, qi, ki: (r, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, dp), lambda r, qi, ki: (r, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, dp), lambda r, qi, ki: (r, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda r, qi, ki: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, dp), lambda r, qi, ki: (r, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 128), lambda r, qi, ki: (r, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 128), lambda r, qi, ki: (r, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dp), lambda r, qi, ki: (r, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, sq_p, dp), qf.dtype),
        scratch_shapes=[pltpu.VMEM((bq, dp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf, drop, dof, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale, bkv, bq, skv, sq, kv_split, n_q,
                          need_mask, sq_p != sq),
        grid=(rows, n_kv, n_q),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda r, ki, qi: (r, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, dp), lambda r, ki, qi: (r, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, dp), lambda r, ki, qi: (r, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda r, ki, qi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, dp), lambda r, ki, qi: (r, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 128), lambda r, ki, qi: (r, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 128), lambda r, ki, qi: (r, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bkv, dp), lambda r, ki, qi: (r, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, dp), lambda r, ki, qi: (r, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, skv_p, dp), kf.dtype),
            jax.ShapeDtypeStruct((rows, skv_p, dp), vf.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bkv, dp), jnp.float32),
            pltpu.VMEM((bkv, dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf, drop, dof, lse, delta)
    return dq, dk, dv


_p_flash_bwd_kernels = make_partitioned(
    "flash_bwd",
    _flash_bwd_kernels,
    rule=(
        "r sqp dp, r kvp dp, r kvp dp, r uno, r sqp dp, r sqp el, "
        "r sqp el -> r sqp dp, r kvp dp, r kvp dp"
    ),
    n_static=7,
    need_replication=("sqp", "kvp", "dp", "uno", "el"),
    batch_dims=(0, 0, 0, 0, 0, 0, 0),
    out_batch_dims=(0, 0, 0),
)


def _flash_bwd(kv_split, block_q, block_kv, interpret, saved, g):
    (qf, kf, vf, drop, out_p, lse), q_shape, skv = saved
    b, sq, h, d = q_shape
    rows, sq_p, dp = qf.shape

    dof = _pad_to(_fold_heads(g.astype(qf.dtype), dp), sq_p, 1)
    # delta = rowsum(do * o) over the TRUE head dim (padding is zero anyway)
    delta = jnp.sum(
        dof.astype(jnp.float32) * out_p.astype(jnp.float32), axis=-1,
        keepdims=True,
    )
    delta = jnp.broadcast_to(delta, (rows, sq_p, 128))
    dq, dk, dv = _p_flash_bwd_kernels(
        qf, kf, vf, drop, dof, lse, delta, sq, skv, d, kv_split, block_q,
        block_kv, interpret,
    )

    def unfold(x, s):
        return (
            x.reshape(b, h, x.shape[1], dp)[:, :, :s, :d].transpose(0, 2, 1, 3)
        )

    return unfold(dq, sq), unfold(dk, skv), unfold(dv, skv), None


_flash.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(
    jax.jit, static_argnames=("kv_split", "block_q", "block_kv", "interpret")
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    drop_tail: jnp.ndarray | None = None,
    kv_split: int | None = None,
    block_q: int = 1024,
    block_kv: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Blocked flash attention over (B, Sq, H, D); K/V (B, Skv, H, D).

    ``kv_split``/``drop_tail``: reference-bank CFG mode — KV is
    ``concat([self (kv_split cols), bank])`` and batch rows with
    ``drop_tail`` attend to the self columns only (fused mask; one pass).
    Differentiable (flash backward, no materialised logits).
    """
    b = q.shape[0]
    if drop_tail is None:
        drop_tail = jnp.zeros((b,), jnp.int32)
        kv_split = None
    return _flash(q, k, v, drop_tail, kv_split, block_q, block_kv, interpret)


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
        -1e9,
        0.0,
    )
    return jax.nn.dot_product_attention(q, k, v, bias=bias)


def ref_flash_attention(
    q, k_self, v_self, k_bank, v_bank, drop_bank,
    rows_per_batch: int = 1, block_q: int = 512, interpret: bool = False,
):
    """Reference-KV attention as ONE fused flash call (bank mask in-kernel)."""
    bank_k = jnp.repeat(k_bank, rows_per_batch, axis=0)
    bank_v = jnp.repeat(v_bank, rows_per_batch, axis=0)
    k_cat = jnp.concatenate([k_self, bank_k], axis=1)
    v_cat = jnp.concatenate([v_self, bank_v], axis=1)
    return flash_attention(
        q, k_cat, v_cat,
        drop_tail=drop_bank, kv_split=k_self.shape[1],
        block_q=block_q, interpret=interpret,
    )


# ------------------------------------------------------- tokens-layout flash
def _tok_fwd_kernel(
    scale, block_kv, skv, n_kv, heads, d, need_mask,
    q_ref, k_ref, v_ref,
    o_ref,
    acc_ref, m_ref, l_ref,
):
    """Flash forward over TOKEN-layout blocks (bq, C)/(bkv, C), C = heads*d.

    The head-folded kernel needs q/k/v materialised as (B*H, S, D) in HBM —
    XLA emits ~0.3-0.6 ms of pure transpose copy per tensor per call at the
    64x64 shapes (trace: `copy.5585` et al., ~11 ms/step).  Here the blocks
    are cut straight from the (B, S, C) activations the Dense projections
    produce, and heads are attended sequentially via in-kernel lane slices
    (the pattern proven by the ctg/nat temporal kernels).  m/l running
    stats live one lane-column per head."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (bq, C)
    k = k_ref[0]  # (bkv, C)
    v = v_ref[0]

    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (bq, bkv) f32
        if need_mask:
            cols = ki * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, logits.shape, 1
            )
            logits = jnp.where(cols < skv, logits, NEG_INF)

        m_prev = m_ref[:, h : h + 1]  # (bq, 1)
        l_prev = l_ref[:, h : h + 1]
        m_cur = jnp.max(logits, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)
        l_ref[:, h : h + 1] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:, h : h + 1] = m_new
        acc_ref[:, sl] = acc_ref[:, sl] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ki == n_kv - 1)
    def _():
        out = []
        for h in range(heads):
            l = l_ref[:, h : h + 1]
            safe = jnp.where(l == 0.0, 1.0, l)
            out.append(acc_ref[:, h * d : (h + 1) * d] / safe)
        o_ref[0] = jnp.concatenate(out, axis=-1).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "block_q", "block_kv", "interpret")
)
def flash_attention_tokens(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    block_q: int = 512,  # bq=1024 exceeds the 16M VMEM budget at C=320
    block_kv: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention over token-layout (B, Sq, C) tensors, C = heads*d.
    Inference forward only (no VJP) — no bank-drop semantics, q unscaled."""
    b, sq, c = q.shape
    skv = k.shape[1]
    d = c // heads
    scale = 1.0 / math.sqrt(d)
    # scale blocks down with channel width to stay inside the 16M scoped
    # VMEM budget (same rule as the no-shift kernel)
    if c > 320:
        block_q = max(128, (block_q * 320 // c) // 128 * 128)
        block_kv = max(128, (block_kv * 320 // c) // 128 * 128)
    bq = min(block_q, max(128, ((sq + 127) // 128) * 128))
    bkv = min(block_kv, max(128, ((skv + 127) // 128) * 128))
    sq_p = ((sq + bq - 1) // bq) * bq
    skv_p = ((skv + bkv - 1) // bkv) * bkv
    n_q, n_kv = sq_p // bq, skv_p // bkv
    qp = _pad_to(q, sq_p, 1)
    kp = _pad_to(k, skv_p, 1)
    vp = _pad_to(v, skv_p, 1)

    kernel = functools.partial(
        _tok_fwd_kernel, scale, bkv, skv, n_kv, heads, d, skv_p != skv
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda r, qi, ki: (r, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, c), lambda r, qi, ki: (r, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, c), lambda r, qi, ki: (r, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, c), lambda r, qi, ki: (r, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, sq_p, c), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, c), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :sq]


def _tokns_fwd_kernel(
    block_kv, skv, n_kv, heads, d, need_mask,
    q_ref, k_ref, v_ref,
    o_ref, l_out_ref,
    acc_ref, l_ref,
):
    """No-shift flash forward: ``p = exp(logits)`` with NO softmax shift.

    At head_dim 40 the kernel is VPU-bound — the MXU passes pad the 40-lane
    contraction to 128 regardless, so wall-clock tracks the per-logit VPU
    op count, not FLOPs.  This kernel cuts it to the floor (exp + one bf16
    convert per logit):
      * q arrives PRE-SCALED by 1/sqrt(d) — drops the `* scale` multiply
        over all logits;
      * no running max and no precomputed bound — drops the broadcast
        subtract (softmax is shift-invariant; see exactness note below);
      * the denominator l is computed ON THE MXU as ``dot(p, ones)`` —
        drops the (bq, bkv) VPU row-reduce.  The extra matmul has N=1
        (pads to the same 128-lane tile the PV matmul already pays) and
        reuses the bf16 p the PV matmul needs anyway, so l is normalised
        against EXACTLY the weights the numerator used.
    Chip A/B (scripts/bench_tok_kernel.py): beats the running-max kernel
    at head_dim >= 80 (res/2 1024q/3072kv d80: 1.47x; d128 experiment:
    2.17x), loses slightly at d=40 (0.93-0.95x) where the extra N=1 MXU
    pass for l costs as much as the whole d=40 PV matmul — and loses to
    the bounded-softmax and unshifted kernels at EVERY measured shape, so
    ``tok_flash`` uses unshifted; this kernel is kept as the measured
    record of the experiment.

    Exactness: post-LayerNorm logits are O(10); f32 exp only overflows
    past ~88.7 and l only degrades below ~1e-30.  The kernel returns the
    raw denominators; the caller falls back to the running-max kernel iff
    any l is nonfinite or ~0, so the result is ALWAYS exact — the fast
    path just skips the shift machinery when it provably didn't matter."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (bq, C) pre-scaled
    k = k_ref[0]  # (bkv, C)
    v = v_ref[0]

    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, bkv) f32
        if need_mask:
            cols = ki * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, logits.shape, 1
            )
            logits = jnp.where(cols < skv, logits, NEG_INF)
        p = jnp.exp(logits).astype(v.dtype)  # exp(NEG_INF) == 0 exactly
        l_ref[:, h : h + 1] += jax.lax.dot_general(
            p, jnp.ones((p.shape[1], 1), v.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:, sl] += jax.lax.dot_general(
            p, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ki == n_kv - 1)
    def _():
        out = []
        for h in range(heads):
            l = l_ref[:, h : h + 1]
            safe = jnp.where(l == 0.0, 1.0, l)
            out.append(acc_ref[:, h * d : (h + 1) * d] / safe)
        o_ref[0] = jnp.concatenate(out, axis=-1).astype(o_ref.dtype)
        l_out_ref[0] = l_ref[:]


def flash_attention_tokens_noshift(
    q, k, v, heads: int, block_q: int = 512, block_kv: int = 1024,
    interpret: bool = False,
):
    """Token-layout flash with shift-free softmax fast path + runtime
    guard.  Returns exactly what ``flash_attention_tokens`` returns; if
    any softmax denominator over- or underflowed without the shift
    (logits beyond ~±87 — impossible for post-LayerNorm activations but
    guarded anyway), recomputes with the running-max kernel."""
    b, sq, c = q.shape
    skv = k.shape[1]
    d = c // heads
    scale = 1.0 / math.sqrt(d)
    # caller-supplied block sizes, kept for the fallback call: the fallback
    # applies its own c>320 VMEM shrink, so passing the already-shrunk value
    # would shrink twice (512->256->128)
    block_q0, block_kv0 = block_q, block_kv
    # scale the q block down with channel width: at C=640 the 512-row block
    # plus the ones-lane tile exceeded the 16M scoped-VMEM budget by ~0.5M
    if c > 320:
        block_q = max(128, (block_q * 320 // c) // 128 * 128)
    bq = min(block_q, max(128, ((sq + 127) // 128) * 128))
    bkv = min(block_kv, max(128, ((skv + 127) // 128) * 128))
    sq_p = ((sq + bq - 1) // bq) * bq
    skv_p = ((skv + bkv - 1) // bkv) * bkv
    n_q, n_kv = sq_p // bq, skv_p // bkv
    qp = _pad_to(q * jnp.asarray(scale, q.dtype), sq_p, 1)
    kp = _pad_to(k, skv_p, 1)
    vp = _pad_to(v, skv_p, 1)

    kernel = functools.partial(
        _tokns_fwd_kernel, bkv, skv, n_kv, heads, d, skv_p != skv
    )
    out, l = pl.pallas_call(
        kernel,
        grid=(b, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda r, qi, ki: (r, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, c), lambda r, qi, ki: (r, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, c), lambda r, qi, ki: (r, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, c), lambda r, qi, ki: (r, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 128), lambda r, qi, ki: (r, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq_p, c), q.dtype),
            jax.ShapeDtypeStruct((b, sq_p, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, c), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    out = out[:, :sq]
    lv = l[:, :sq, :heads]
    # l finite+positive is not sufficient: the f32 PV accumulator can
    # overflow to inf while l stays finite (logits ~87-88 with |v| > 1), so
    # the "ALWAYS exact" contract also requires a finite output
    ok = jnp.logical_and(
        jnp.logical_and(jnp.min(lv) > 1e-30, jnp.all(jnp.isfinite(lv))),
        jnp.all(jnp.isfinite(out.astype(jnp.float32))),
    )
    return jax.lax.cond(
        ok,
        lambda: out,
        lambda: flash_attention_tokens(
            q, k, v, heads=heads, block_q=block_q0, block_kv=block_kv0,
            interpret=interpret,
        ),
    )


def _tokf_fwd_kernel(
    block_kv, skv, n_kv, heads, d, need_mask, scale, trans,
    q_ref, k_ref, v_ref,
    o_ref, guard_ref,
    acc_ref, l_ref, qs_ref,
):
    """Unshifted exp2 flash forward: ``p = exp2(logits2)`` with NO shift at
    all — the per-logit VPU floor (exp2 + sum-accumulate + bf16 convert).

    Combines the two halves that each lost separately: the no-shift kernel
    (``_tokns_fwd_kernel``) dropped the subtract but paid an extra N=1 MXU
    pass for l; the bounded kernel kept a per-logit subtract to buy
    guaranteed-no-overflow.  Here l accumulates on the VPU like the bounded
    kernel and nothing is subtracted: softmax is shift-invariant, so the
    result is bit-comparable whenever exp2 neither overflows (true max
    logit2 > 127 — post-LayerNorm logits are O(10) base-2) nor flushes an
    entire row to zero (all logits2 < ~-126).  The caller checks the
    returned denominators and falls back to the running-max kernel on
    either failure, so the output is ALWAYS exact.

    ``trans=True`` reads q/k/v blocks in channel-major ``(C, s)`` layout:
    the q/k/v projection dots naturally emit ``bf16[b,s,c]{1,2,0}``
    (physically channel-minor = (b, c, s)), and with token-major operand
    constraints XLA re-layouts each one into the Pallas custom call — 30
    copies x 42 MB per denoise step in the r4 trace (~250 ms/clip).  With
    channel-major blocks the caller's ``swapaxes(proj, 1, 2)`` is a free
    bitcast of the dot output and the copies vanish; in-kernel the head
    slice moves to the sublane axis and both dots contract it (lhsT/rhsT
    forms the MXU natively supports).  Output stays token-major (the
    out-projection consumes it that way)."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        # softmax scale (x log2 e) folded into q HERE, once per q block in
        # VMEM: as a caller-side multiply it was a full extra HBM pass over
        # q per call (Pallas custom calls cannot fuse elementwise producers
        # -- ~0.1 s/clip of broadcast_multiply/copy in the r4 trace)
        qs_ref[:] = q_ref[0] * jnp.asarray(scale, q_ref.dtype)

    q = qs_ref[:]  # (bq, C) — or (C, bq) when trans — scaled by log2(e)/sqrt(d)
    k = k_ref[0]  # (bkv, C) / (C, bkv)
    v = v_ref[0]

    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        if trans:
            logits = jax.lax.dot_general(
                q[sl], k[sl], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (bq, bkv) f32, base-2 scaled
        else:
            logits = jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if need_mask:
            cols = ki * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, logits.shape, 1
            )
            logits = jnp.where(cols < skv, logits, NEG_INF)
        p = jnp.exp2(logits)
        l_ref[:, h : h + 1] += jnp.sum(p, axis=1, keepdims=True)
        if trans:
            acc_ref[:, sl] += jax.lax.dot_general(
                p.astype(v.dtype), v[sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            acc_ref[:, sl] += jax.lax.dot_general(
                p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(ki == n_kv - 1)
    def _():
        out = []
        for h in range(heads):
            l = l_ref[:, h : h + 1]
            safe = jnp.where(l == 0.0, 1.0, l)
            out.append(acc_ref[:, h * d : (h + 1) * d] / safe)
        outv = jnp.concatenate(out, axis=-1)
        o_ref[0] = outv.astype(o_ref.dtype)
        # guard REDUCED in-kernel to one scalar per q block: min softmax
        # denominator if every l/out value is finite, else -1.  The caller
        # tests min(guard) > 1e-30.  The previous full (B, Sq, 128) f32 l
        # output was ~33 MB write + read PER CALL just to evaluate this
        # predicate (~40 ms/clip).
        lh = l_ref[:, :heads]
        finite = jnp.logical_and(
            jnp.all(jnp.isfinite(lh)), jnp.all(jnp.isfinite(outv))
        )
        gv = jnp.where(finite, jnp.min(lh), -1.0)
        guard_ref[0] = jnp.zeros_like(guard_ref[0]) + gv


def flash_attention_tokens_unshifted(
    q, k, v, heads: int, block_q: int = 512, block_kv: int = 1024,
    interpret: bool = False, transposed: bool = False,
):
    """Token-layout flash with the unshifted exp2 fast path + runtime
    guard (see ``_tokf_fwd_kernel``).  Returns exactly what
    ``flash_attention_tokens`` returns; recomputes with the running-max
    kernel iff any denominator over- or underflowed.

    ``transposed=True``: q/k/v arrive channel-major ``(B, C, S)`` (free
    bitcast of the projection dots' natural output layout); the result is
    still token-major ``(B, Sq, C)``."""
    if transposed:
        b, c, sq = q.shape
        skv = k.shape[2]
        s_axis = 2
    else:
        b, sq, c = q.shape
        skv = k.shape[1]
        s_axis = 1
    d = c // heads
    # softmax scale (x log2 e) is applied IN-KERNEL at q-block load — a
    # caller-side multiply cannot fuse into the Pallas custom call and cost
    # a full HBM pass over q per call (~0.1 s/clip in the r4 trace)
    scale2 = math.log2(math.e) / math.sqrt(d)
    # caller-supplied block sizes for the fallback (which re-applies the
    # same c>320 shrink — see flash_attention_tokens_noshift)
    block_q0, block_kv0 = block_q, block_kv
    if c > 320:
        block_q = max(128, (block_q * 320 // c) // 128 * 128)
    bq = min(block_q, max(128, ((sq + 127) // 128) * 128))
    bkv = min(block_kv, max(128, ((skv + 127) // 128) * 128))
    sq_p = ((sq + bq - 1) // bq) * bq
    skv_p = ((skv + bkv - 1) // bkv) * bkv
    n_q, n_kv = sq_p // bq, skv_p // bkv
    qp = _pad_to(q, sq_p, s_axis)
    kp = _pad_to(k, skv_p, s_axis)
    vp = _pad_to(v, skv_p, s_axis)

    kernel = functools.partial(
        _tokf_fwd_kernel, bkv, skv, n_kv, heads, d, skv_p != skv, scale2,
        transposed,
    )
    if transposed:
        q_spec = pl.BlockSpec((1, c, bq), lambda r, qi, ki: (r, 0, qi),
                              memory_space=pltpu.VMEM)
        kv_spec = pl.BlockSpec((1, c, bkv), lambda r, qi, ki: (r, 0, ki),
                               memory_space=pltpu.VMEM)
        qs_scratch = pltpu.VMEM((c, bq), q.dtype)
    else:
        q_spec = pl.BlockSpec((1, bq, c), lambda r, qi, ki: (r, qi, 0),
                              memory_space=pltpu.VMEM)
        kv_spec = pl.BlockSpec((1, bkv, c), lambda r, qi, ki: (r, ki, 0),
                               memory_space=pltpu.VMEM)
        qs_scratch = pltpu.VMEM((bq, c), q.dtype)
    out, guard = pl.pallas_call(
        kernel,
        grid=(b, n_q, n_kv),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=[
            pl.BlockSpec((1, bq, c), lambda r, qi, ki: (r, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda r, qi, ki: (r, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq_p, c), q.dtype),
            jax.ShapeDtypeStruct((b, n_q * 8, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, c), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            qs_scratch,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    out = out[:, :sq]
    # guard: per-q-block scalar = min softmax denominator when every l/out
    # value is finite, else -1 — covers underflow AND the PV-accumulator
    # overflow crack, with no full-size l round trip through HBM
    ok = jnp.min(guard) > 1e-30

    def fallback():
        if transposed:
            return flash_attention_tokens(
                jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                jnp.swapaxes(v, 1, 2), heads=heads, block_q=block_q0,
                block_kv=block_kv0, interpret=interpret,
            )
        return flash_attention_tokens(
            q, k, v, heads=heads, block_q=block_q0, block_kv=block_kv0,
            interpret=interpret,
        )

    return jax.lax.cond(ok, lambda: out, fallback)


def _tokb_fwd_kernel(
    block_kv, skv, n_kv, heads, d, need_mask,
    q_ref, k_ref, v_ref, bound_ref,
    o_ref, l_out_ref,
    acc_ref, l_ref,
):
    """Bounded-softmax flash forward: ``p = exp2(logits2 - M2)`` with a
    PRECOMPUTED per-(row, head) upper bound M2 >= max(logits2) (Cauchy-
    Schwarz on q/k norms) instead of the online running max.

    The running-max machinery is a loop-carried serial chain (max-reduce ->
    alpha -> acc rescale) that stalls the MXU/VPU pipeline; with a fixed
    per-row shift every block's exp/sum/PV is independent of the previous
    block except through pure += accumulators, so Mosaic can overlap VPU
    softmax with the next block's MXU.  Chip A/B at the driver's hot
    shapes (scripts/bench_tok_kernel.py): fastest of the three kernels at
    every measured shape (the per-logit VPU work, not MXU passes, bounds
    the kernel at head_dim 40).

    The kernel is per-logit VPU-bound, so the caller folds BOTH softmax
    scalars into q before the pallas_call: q arrives pre-multiplied by
    ``log2(e)/sqrt(d)`` and the kernel computes base-2 exponentials —
    exp(s·qk - m) == exp2((s·log2e)·qk - log2e·m).  That deletes the
    per-logit `* scale` multiply AND the multiply hidden inside the VPU's
    exp lowering (exp(x) = exp2(x·log2e)), leaving subtract + exp2 +
    bf16-convert + add as the only per-logit VPU ops.

    Exactness: softmax is shift-invariant, so any M >= max gives
    bit-comparable results (p is smaller by exp2(max - M) but division by
    l cancels it at identical relative f32 precision) — UNLESS the bound
    is so loose that exp2(max - M) underflows f32 (max - M < ~-126 in
    base 2).  Then l collapses toward 0, which the caller detects via the
    l output and falls back to the running-max kernel
    (``flash_attention_tokens``)."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (bq, C) pre-scaled by log2(e)/sqrt(d)
    k = k_ref[0]  # (bkv, C)
    v = v_ref[0]
    bound = bound_ref[0]  # (bq, 128) f32; head h's base-2 bound in column h

    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, bkv) f32, base-2 scaled
        if need_mask:
            cols = ki * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, logits.shape, 1
            )
            logits = jnp.where(cols < skv, logits, NEG_INF)
        p = jnp.exp2(logits - bound[:, h : h + 1])
        l_ref[:, h : h + 1] += jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:, sl] += jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ki == n_kv - 1)
    def _():
        out = []
        for h in range(heads):
            l = l_ref[:, h : h + 1]
            safe = jnp.where(l == 0.0, 1.0, l)
            out.append(acc_ref[:, h * d : (h + 1) * d] / safe)
        o_ref[0] = jnp.concatenate(out, axis=-1).astype(o_ref.dtype)
        l_out_ref[0] = l_ref[:]


def _bounds_cauchy_schwarz(q, k, heads, d, scale, sq_p):
    """Per-(batch, q-token, head) logit upper bound scale*|q_h|*max|k_h|,
    laid out (B, Sq_p, 128) f32 with head h in lane column h.

    The per-head sum of squares is computed as ``(x*x) @ S`` with S a
    (C, heads) 0/1 head-selector — the square fuses into the dot's operand
    read and the MXU does the d-lane group reduce.  The naive
    ``reshape(b,s,h,d).sum(-1)`` form made XLA materialise a full f32 copy
    of q AND k plus a {2,1,0}->{1,2,0} layout copy just to get the d axis
    into sublanes (~1.3 ms per cond 64x64 call, ~0.35 s/clip in the r3
    trace).  f32 rounding of the fused square perturbs the bound by <1e-6
    relative — softmax is shift-invariant, so any such bound stays exact
    as long as it neither underflows (caller's l-guard) nor overflows
    exp2 (would need a true max logit ~2^14, unreachable in bf16
    activations).
    """
    b, sq, c = q.shape
    sel = (
        jnp.arange(c)[:, None] // d == jnp.arange(heads)[None, :]
    ).astype(jnp.float32)  # (C, heads) head selector
    dn = (((2,), (0,)), ((), ()))
    qf = q.astype(jnp.float32)
    qn2 = jax.lax.dot_general(qf * qf, sel, dn,
                              preferred_element_type=jnp.float32)
    kf = k.astype(jnp.float32)
    kn2 = jax.lax.dot_general(kf * kf, sel, dn,
                              preferred_element_type=jnp.float32)
    kn = jnp.sqrt(jnp.max(kn2, axis=1))  # (b, h)
    m = scale * jnp.sqrt(qn2) * kn[:, None, :]  # (b, sq, h)
    m = jnp.pad(m, ((0, 0), (0, sq_p - sq), (0, 128 - heads)))
    return m


def flash_attention_tokens_bounded(
    q, k, v, heads: int, block_q: int = 512, block_kv: int = 1024,
    interpret: bool = False,
):
    """Token-layout flash with bounded-softmax fast path + runtime guard.
    Returns exactly what ``flash_attention_tokens`` returns; if the
    Cauchy-Schwarz bound is ever >~85 logits above the true max (softmax
    weights underflow, l -> 0), recomputes with the running-max kernel."""
    b, sq, c = q.shape
    skv = k.shape[1]
    d = c // heads
    # fold softmax scale AND the exp->exp2 conversion into q up front (the
    # kernel is per-logit VPU-bound; see _tokb_fwd_kernel).  Costs one extra
    # rounding of q in its own dtype (<=1 ulp) — well under bf16 noise.
    scale2 = math.log2(math.e) / math.sqrt(d)
    qs = q * jnp.asarray(scale2, q.dtype)  # q itself feeds the fallback
    # caller-supplied block sizes for the fallback (re-applies its own shrink)
    block_q0, block_kv0 = block_q, block_kv
    # scale the q block down with channel width to stay inside the 16M
    # scoped VMEM budget (same rule as the other token-layout kernels)
    if c > 320:
        block_q = max(128, (block_q * 320 // c) // 128 * 128)
    bq = min(block_q, max(128, ((sq + 127) // 128) * 128))
    bkv = min(block_kv, max(128, ((skv + 127) // 128) * 128))
    sq_p = ((sq + bq - 1) // bq) * bq
    skv_p = ((skv + bkv - 1) // bkv) * bkv
    n_q, n_kv = sq_p // bq, skv_p // bkv
    qp = _pad_to(qs, sq_p, 1)
    kp = _pad_to(k, skv_p, 1)
    vp = _pad_to(v, skv_p, 1)
    # base-2 bound on the PRE-SCALED q (scale folded in already)
    bounds = _bounds_cauchy_schwarz(qs, k, heads, d, 1.0, sq_p)

    kernel = functools.partial(
        _tokb_fwd_kernel, bkv, skv, n_kv, heads, d, skv_p != skv
    )
    out, l = pl.pallas_call(
        kernel,
        grid=(b, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda r, qi, ki: (r, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, c), lambda r, qi, ki: (r, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, c), lambda r, qi, ki: (r, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 128), lambda r, qi, ki: (r, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, c), lambda r, qi, ki: (r, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 128), lambda r, qi, ki: (r, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq_p, c), q.dtype),
            jax.ShapeDtypeStruct((b, sq_p, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, c), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, bounds)
    out = out[:, :sq]
    # p = exp2(logits - bound) <= 1 per logit here, so the PV accumulator
    # cannot overflow while l stays positive — the l check alone suffices
    ok = jnp.min(l[:, :sq, :heads]) > 1e-30
    return jax.lax.cond(
        ok,
        lambda: out,
        lambda: flash_attention_tokens(
            q, k, v, heads=heads, block_q=block_q0, block_kv=block_kv0,
            interpret=interpret,
        ),
    )


_p_tokf = make_partitioned(
    "tokf",
    lambda q, k, v, heads, bq, bkv, interp: flash_attention_tokens_unshifted(
        q, k, v, heads=heads, block_q=bq, block_kv=bkv, interpret=interp,
        transposed=False,
    ),
    rule="b sq c, b skv c, b skv c -> b sq c",
    n_static=4,
    need_replication=("sq", "skv", "c"),
    batch_dims=(0, 0, 0),
)

_p_tokf_t = make_partitioned(
    "tokf_t",
    lambda q, k, v, heads, bq, bkv, interp: flash_attention_tokens_unshifted(
        q, k, v, heads=heads, block_q=bq, block_kv=bkv, interpret=interp,
        transposed=True,
    ),
    rule="b c sq, b c skv, b c skv -> b sq c",
    n_static=4,
    need_replication=("sq", "skv", "c"),
    batch_dims=(0, 0, 0),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def tok_flash(q, k, v, heads, block_q=512, block_kv=1024, interpret=False):
    """Differentiable token-layout flash attention: UNSHIFTED exp2 Pallas
    forward — the chip A/B (scripts/bench_tok_kernel.py) measured it
    fastest at EVERY hot shape (d40 cond 15.21 vs 15.72 bounded / 19.09
    running-max ms; d40 uncond 9.63 vs 9.70 / 11.33; d80 res/2 4.26 vs
    4.48 / 7.15), and it deletes the Cauchy-Schwarz bound precompute the
    bounded kernel needs — guarded exact (falls back to the running-max
    kernel if any softmax denominator over- or underflowed without the
    shift).  Backward via the head-folded flash VJP (recompute; training
    only)."""
    return _p_tokf(q, k, v, heads, block_q, block_kv, interpret)


def _tok_flash_fwd(q, k, v, heads, block_q, block_kv, interpret):
    return tok_flash(q, k, v, heads, block_q, block_kv, interpret), (q, k, v)


def _tok_flash_bwd(heads, block_q, block_kv, interpret, res, g):
    q, k, v = res

    def f(q, k, v):
        b, s, c = q.shape
        skv = k.shape[1]
        d = c // heads
        out = _flash(
            q.reshape(b, s, heads, d),
            k.reshape(b, skv, heads, d),
            v.reshape(b, skv, heads, d),
            jnp.zeros((b,), jnp.int32), None, block_q, block_kv, interpret,
        )
        return out.reshape(b, s, c)

    _, vjp = jax.vjp(f, q, k, v)
    return vjp(g)


tok_flash.defvjp(_tok_flash_fwd, _tok_flash_bwd)


def _tokf_banked_kernel(
    block_kv, s_self, n_self, s_bank, n_kv, heads, d,
    mask_self, mask_bank, scale, trans,
    q_ref, k_ref, v_ref, kb_ref, vb_ref,
    o_ref, guard_ref,
    acc_ref, l_ref, qs_ref,
):
    """Unshifted exp2 flash forward over TWO KV segments: per-row self
    tokens (k/v) for grid steps ki < n_self, then shared reference-bank
    tokens (kb/vb) for ki >= n_self.  Equal to ``_tokf_fwd_kernel`` run on
    ``concat([k, repeat(bank)], axis=1)`` — the segments are visited in
    concat order with the same accumulators — WITHOUT ever materialising
    the concat in HBM.  In the driver pipeline that concat was rebuilt
    every denoise step for every reference-reading layer (the bank half is
    loop-invariant but the self half is not, so XLA could not hoist it):
    16 concat+pad fusions per step, ~0.15 s/clip of pure HBM writes in the
    r4 trace (reference role: the KV cat at mutual_self_attention.py:
    147-165)."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        # scale folded into q once per q block in VMEM (see _tokf_fwd_kernel)
        qs_ref[:] = q_ref[0] * jnp.asarray(scale, q_ref.dtype)

    q = qs_ref[:]  # (bq, C) — or (C, bq) when trans — scaled by log2(e)/sqrt(d)

    def accumulate(k, v, need_mask, valid, base_blocks):
        for h in range(heads):
            sl = slice(h * d, (h + 1) * d)
            if trans:
                logits = jax.lax.dot_general(
                    q[sl], k[sl], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (bq, bkv) f32, base-2 scaled
            else:
                logits = jax.lax.dot_general(
                    q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            if need_mask:
                cols = (ki - base_blocks) * block_kv + jax.lax.broadcasted_iota(
                    jnp.int32, logits.shape, 1
                )
                logits = jnp.where(cols < valid, logits, NEG_INF)
            p = jnp.exp2(logits)
            l_ref[:, h : h + 1] += jnp.sum(p, axis=1, keepdims=True)
            if trans:
                acc_ref[:, sl] += jax.lax.dot_general(
                    p.astype(v.dtype), v[sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                acc_ref[:, sl] += jax.lax.dot_general(
                    p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

    @pl.when(ki < n_self)
    def _():
        accumulate(k_ref[0], v_ref[0], mask_self, s_self, 0)

    @pl.when(ki >= n_self)
    def _():
        accumulate(kb_ref[0], vb_ref[0], mask_bank, s_bank, n_self)

    @pl.when(ki == n_kv - 1)
    def _():
        out = []
        for h in range(heads):
            l = l_ref[:, h : h + 1]
            safe = jnp.where(l == 0.0, 1.0, l)
            out.append(acc_ref[:, h * d : (h + 1) * d] / safe)
        outv = jnp.concatenate(out, axis=-1)
        o_ref[0] = outv.astype(o_ref.dtype)
        # per-q-block scalar guard (see _tokf_fwd_kernel)
        lh = l_ref[:, :heads]
        finite = jnp.logical_and(
            jnp.all(jnp.isfinite(lh)), jnp.all(jnp.isfinite(outv))
        )
        gv = jnp.where(finite, jnp.min(lh), -1.0)
        guard_ref[0] = jnp.zeros_like(guard_ref[0]) + gv


def _banked_concat(k, v, kb, vb, rep):
    """Materialised-concat equivalent of the banked operands (fallback and
    VJP path)."""
    return (
        jnp.concatenate([k, jnp.repeat(kb, rep, axis=0)], axis=1),
        jnp.concatenate([v, jnp.repeat(vb, rep, axis=0)], axis=1),
    )


def _tok_flash_banked_impl(
    q, k, v, kb, vb, heads, rep, block_q, block_kv, interpret, transposed,
):
    """Shared body of ``tok_flash_banked`` / ``tok_flash_banked_t``.
    ``transposed=True`` takes all five operands channel-major ``(B, C, S)``
    (see ``_tokf_fwd_kernel``); output is token-major either way."""
    if transposed:
        b, c, sq = q.shape
        s_self, s_bank = k.shape[2], kb.shape[2]
        s_axis = 2
    else:
        b, sq, c = q.shape
        s_self, s_bank = k.shape[1], kb.shape[1]
        s_axis = 1
    d = c // heads
    scale2 = math.log2(math.e) / math.sqrt(d)  # folded into q IN-KERNEL
    block_q0, block_kv0 = block_q, block_kv
    if c > 320:
        block_q = max(128, (block_q * 320 // c) // 128 * 128)
        # this kernel double-buffers FOUR (bkv, c) KV refs (self + bank);
        # at c=640 the c>320 q shrink alone left 17.3M > the 16M scoped
        # VMEM limit — shrink the KV block with channel width too
        block_kv = max(256, (block_kv * 320 // c) // 128 * 128)
    bq = min(block_q, max(128, ((sq + 127) // 128) * 128))
    longest = max(s_self, s_bank)
    bkv = min(block_kv, max(128, ((longest + 127) // 128) * 128))
    sq_p = ((sq + bq - 1) // bq) * bq
    s_self_p = ((s_self + bkv - 1) // bkv) * bkv
    s_bank_p = ((s_bank + bkv - 1) // bkv) * bkv
    n_q = sq_p // bq
    n_self, n_bank = s_self_p // bkv, s_bank_p // bkv
    n_kv = n_self + n_bank
    qp = _pad_to(q, sq_p, s_axis)
    kp = _pad_to(k, s_self_p, s_axis)
    vp = _pad_to(v, s_self_p, s_axis)
    kbp = _pad_to(kb, s_bank_p, s_axis)
    vbp = _pad_to(vb, s_bank_p, s_axis)

    kernel = functools.partial(
        _tokf_banked_kernel, bkv, s_self, n_self, s_bank, n_kv, heads, d,
        s_self_p != s_self, s_bank_p != s_bank, scale2, transposed,
    )
    # index maps clamp each segment's block index while the other segment
    # is active, so Mosaic's revisit check sees an unchanged block and skips
    # the DMA (one extra fetch per segment transition, nothing per step)
    if transposed:
        q_blkshape = (1, c, bq)
        kv_blkshape = (1, c, bkv)
        q_blk = lambda r, qi, ki: (r, 0, qi)
        self_blk = lambda r, qi, ki: (r, 0, jnp.minimum(ki, n_self - 1))
        bank_blk = lambda r, qi, ki: (
            r // rep, 0, jnp.maximum(ki - n_self, 0),
        )
        qs_scratch = pltpu.VMEM((c, bq), q.dtype)
    else:
        q_blkshape = (1, bq, c)
        kv_blkshape = (1, bkv, c)
        q_blk = lambda r, qi, ki: (r, qi, 0)
        self_blk = lambda r, qi, ki: (r, jnp.minimum(ki, n_self - 1), 0)
        bank_blk = lambda r, qi, ki: (
            r // rep, jnp.maximum(ki - n_self, 0), 0,
        )
        qs_scratch = pltpu.VMEM((bq, c), q.dtype)
    out, guard = pl.pallas_call(
        kernel,
        grid=(b, n_q, n_kv),
        in_specs=[
            pl.BlockSpec(q_blkshape, q_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec(kv_blkshape, self_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec(kv_blkshape, self_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec(kv_blkshape, bank_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec(kv_blkshape, bank_blk, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, c), lambda r, qi, ki: (r, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda r, qi, ki: (r, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq_p, c), q.dtype),
            jax.ShapeDtypeStruct((b, n_q * 8, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, c), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            qs_scratch,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, kbp, vbp)
    out = out[:, :sq]
    ok = jnp.min(guard) > 1e-30

    def fallback():
        if transposed:
            qs, ks, vs, kbs, vbs = (
                jnp.swapaxes(t, 1, 2) for t in (q, k, v, kb, vb)
            )
        else:
            qs, ks, vs, kbs, vbs = q, k, v, kb, vb
        kc, vc = _banked_concat(ks, vs, kbs, vbs, rep)
        return flash_attention_tokens(
            qs, kc, vc, heads=heads, block_q=block_q0, block_kv=block_kv0,
            interpret=interpret,
        )

    return jax.lax.cond(ok, lambda: out, fallback)


def _check_banked_shapes(q, kb, vb, rep):
    """Loud shape validation: the banked kernel's ``r // rep`` bank index
    map would silently read the wrong bank row on a batch mismatch (the
    old concat+repeat form failed with a shape error instead)."""
    if kb.shape[0] * rep != q.shape[0] or vb.shape != kb.shape:
        raise ValueError(
            f"banked attention batch mismatch: q batch {q.shape[0]} != "
            f"bank batch {kb.shape[0]} x rep {rep} (vb {vb.shape})"
        )


def _banked_dispatch(transposed):
    def impl(q, k, v, kb, vb, heads, rep, block_q, block_kv, interpret):
        # rep re-derived from (possibly per-shard local) shapes: under the
        # mesh each shard holds rep/frame-ways rows per bank row
        rep_local = q.shape[0] // kb.shape[0]
        return _tok_flash_banked_impl(
            q, k, v, kb, vb, heads, rep_local, block_q, block_kv, interpret,
            transposed,
        )
    return impl


def _banked_rule(transposed):
    """Rule for the two-segment banked kernel; degenerates when the bank
    batch n or the repeat r is 1 (Shardy rejects size-1 factors inside
    compound factors)."""

    def fn(shapes, heads, rep, bq, bkv, interp):
        n = shapes[3][0]
        if transposed:
            q, k, bk = "c sq", "c sk", "c sb"
        else:
            q, k, bk = "sq c", "sk c", "sb c"
        if n == 1:
            lead, bank, sizes = "b", "n1", {}
        elif rep == 1:
            lead, bank, sizes = "b", "b", {}
        else:
            lead, bank, sizes = "(n r)", "n", {"r": rep}
        return (
            f"{lead} {q}, {lead} {k}, {lead} {k}, {bank} {bk}, {bank} {bk}"
            f" -> {lead} sq c",
            sizes,
        )

    return fn


_p_banked = make_partitioned(
    "tok_banked",
    _banked_dispatch(False),
    rule=_banked_rule(False),
    n_static=5,
    need_replication=("sq", "sk", "sb", "c", "n1"),
    batch_dims=(0, 0, 0, 0, 0),
    bank_ops=(3, 4),
)

_p_banked_t = make_partitioned(
    "tok_banked_t",
    _banked_dispatch(True),
    rule=_banked_rule(True),
    n_static=5,
    need_replication=("sq", "sk", "sb", "c", "n1"),
    batch_dims=(0, 0, 0, 0, 0),
    bank_ops=(3, 4),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def tok_flash_banked(
    q, k, v, kb, vb, heads, rep=1, block_q=512, block_kv=1024,
    interpret=False,
):
    """Token-layout flash attention with a separate reference-bank KV
    segment: ``q (B, Sq, C)`` attends ``[k | repeat(kb, rep)]`` where
    ``kb/vb (B//rep, S_bank, C)`` are shared by groups of ``rep``
    consecutive batch rows.  Guarded exact like ``tok_flash`` (falls back
    to the running-max kernel on the materialised concat if any softmax
    denominator over-/underflowed).  Backward differentiates the concat
    form (training only; inference never takes it)."""
    _check_banked_shapes(q, kb, vb, rep)
    return _p_banked(q, k, v, kb, vb, heads, rep, block_q, block_kv,
                     interpret)


def _tok_flash_banked_fwd(q, k, v, kb, vb, heads, rep, block_q, block_kv,
                          interpret):
    return (
        tok_flash_banked(q, k, v, kb, vb, heads, rep, block_q, block_kv,
                         interpret),
        (q, k, v, kb, vb),
    )


def _tok_flash_banked_bwd(heads, rep, block_q, block_kv, interpret, res, g):
    q, k, v, kb, vb = res

    def f(q, k, v, kb, vb):
        kc, vc = _banked_concat(k, v, kb, vb, rep)
        b, s, c = q.shape
        skv = kc.shape[1]
        d = c // heads
        out = _flash(
            q.reshape(b, s, heads, d),
            kc.reshape(b, skv, heads, d),
            vc.reshape(b, skv, heads, d),
            jnp.zeros((b,), jnp.int32), None, block_q, block_kv, interpret,
        )
        return out.reshape(b, s, c)

    _, vjp = jax.vjp(f, q, k, v, kb, vb)
    return vjp(g)


tok_flash_banked.defvjp(_tok_flash_banked_fwd, _tok_flash_banked_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def tok_flash_t(q, k, v, heads, block_q=512, block_kv=1024, interpret=False):
    """``tok_flash`` with channel-major ``(B, C, S)`` operands: the caller's
    ``swapaxes(proj, 1, 2)`` of the q/k/v projection dots is a free bitcast
    of their natural ``{1,2,0}`` output layout, deleting the 42 MB
    relayout copy per operand that the token-major operand constraint
    forced (r4 trace: 30 copies x 42 MB per denoise step at top res).
    Output is token-major ``(B, Sq, C)`` like ``tok_flash``."""
    return _p_tokf_t(q, k, v, heads, block_q, block_kv, interpret)


def _tok_flash_t_fwd(q, k, v, heads, block_q, block_kv, interpret):
    return tok_flash_t(q, k, v, heads, block_q, block_kv, interpret), (q, k, v)


def _tok_flash_t_bwd(heads, block_q, block_kv, interpret, res, g):
    qt, kt, vt = res

    def f(qt, kt, vt):
        q = jnp.swapaxes(qt, 1, 2)
        k = jnp.swapaxes(kt, 1, 2)
        v = jnp.swapaxes(vt, 1, 2)
        b, s, c = q.shape
        skv = k.shape[1]
        d = c // heads
        out = _flash(
            q.reshape(b, s, heads, d),
            k.reshape(b, skv, heads, d),
            v.reshape(b, skv, heads, d),
            jnp.zeros((b,), jnp.int32), None, block_q, block_kv, interpret,
        )
        return out.reshape(b, s, c)

    _, vjp = jax.vjp(f, qt, kt, vt)
    return vjp(g)


tok_flash_t.defvjp(_tok_flash_t_fwd, _tok_flash_t_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def tok_flash_banked_t(
    q, k, v, kb, vb, heads, rep=1, block_q=512, block_kv=1024,
    interpret=False,
):
    """``tok_flash_banked`` with channel-major ``(B, C, S)`` operands (see
    ``tok_flash_t`` for why); output token-major ``(B, Sq, C)``."""
    _check_banked_shapes(q, kb, vb, rep)
    return _p_banked_t(q, k, v, kb, vb, heads, rep, block_q, block_kv,
                       interpret)


def _tok_flash_banked_t_fwd(q, k, v, kb, vb, heads, rep, block_q, block_kv,
                            interpret):
    return (
        tok_flash_banked_t(q, k, v, kb, vb, heads, rep, block_q, block_kv,
                           interpret),
        (q, k, v, kb, vb),
    )


def _tok_flash_banked_t_bwd(heads, rep, block_q, block_kv, interpret, res, g):
    qt, kt, vt, kbt, vbt = res

    def f(qt, kt, vt, kbt, vbt):
        q, k, v, kb, vb = (jnp.swapaxes(t, 1, 2)
                           for t in (qt, kt, vt, kbt, vbt))
        kc, vc = _banked_concat(k, v, kb, vb, rep)
        b, s, c = q.shape
        skv = kc.shape[1]
        d = c // heads
        out = _flash(
            q.reshape(b, s, heads, d),
            kc.reshape(b, skv, heads, d),
            vc.reshape(b, skv, heads, d),
            jnp.zeros((b,), jnp.int32), None, block_q, block_kv, interpret,
        )
        return out.reshape(b, s, c)

    _, vjp = jax.vjp(f, qt, kt, vt, kbt, vbt)
    return vjp(g)


tok_flash_banked_t.defvjp(_tok_flash_banked_t_fwd, _tok_flash_banked_t_bwd)


# ---------------------------------------------------------- small-seq packed
def _small_seq_kernel(s, n_valid_rows, q_ref, k_ref, v_ref, o_ref):
    """``nb`` 128-row tiles of packed sequences: block-diagonal attention.

    q is pre-scaled.  Rows belong to sequences of length ``s`` packed along
    each tile; rows >= n_valid_rows (within a tile) are padding (masked to
    a uniform distribution over their own dead block — discarded by the
    caller).  Multiple tiles per grid step amortise the per-step DMA issue
    cost (one tile/step was DMA-bound: ~4 descriptors x ~0.5 us x 8192)."""
    q = q_ref[:]  # (nb, T, dp)
    k = k_ref[:]
    v = v_ref[:]
    nb, t, _ = q.shape

    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (nb, T, T)
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    same_seq = (rows // s) == (cols // s)
    valid = jnp.logical_and(same_seq, cols < n_valid_rows)
    # padding rows keep their own (dead) block unmasked -> uniform softmax,
    # finite values, no NaN; caller slices them away
    valid = jnp.logical_or(valid, jnp.logical_and(same_seq, rows >= n_valid_rows))
    logits = jnp.where(valid[None], logits, -1e9)

    m = jnp.max(logits, axis=2, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=2, keepdims=True)
    o_ref[:] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("seq", "n_valid_rows", "interpret"))
def small_seq_attention_pallas(qp, kp, vp, seq: int, n_valid_rows: int = None,
                               interpret: bool = False):
    """Packed tiles (n, T, dp) of sequences of length ``seq`` (pre-scaled q).
    Returns (n, T, dp).  T and dp must be tile-aligned (caller packs)."""
    n, t, dp = qp.shape
    nv = t if n_valid_rows is None else n_valid_rows
    nb = 8
    pad_n = (-n) % nb
    if pad_n:
        qp = jnp.pad(qp, ((0, pad_n), (0, 0), (0, 0)))
        kp = jnp.pad(kp, ((0, pad_n), (0, 0), (0, 0)))
        vp = jnp.pad(vp, ((0, pad_n), (0, 0), (0, 0)))
    n_p = qp.shape[0]
    out = pl.pallas_call(
        functools.partial(_small_seq_kernel, seq, nv),
        grid=(n_p // nb,),
        in_specs=[
            pl.BlockSpec((nb, t, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, t, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, t, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, t, dp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_p, t, dp), qp.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:n]


def _ctg_kernel(s, heads, d, scale, q_ref, k_ref, v_ref, o_ref):
    """Contiguous-sequence packed temporal attention tile.

    Each (t, c) tile holds g = t // s COMPLETE sequences with their frames
    contiguous — i.e. the tiles are a plain reshape of the (B, S, C) token
    tensor, NO (B, S, H, D) -> (B, H, S, D) head-fold transpose in HBM
    (those transposes were ~4 x 0.8 ms of pure copy per attention call in
    the trace).  Heads live in the lane axis (c = heads * d) and are
    attended independently via in-kernel lane slices; q is pre-scaled."""
    # scale folded into q in VMEM (see _nat_kernel)
    q = q_ref[:] * jnp.asarray(scale, q_ref.dtype)  # (nb, t, c)
    k = k_ref[:]
    v = v_ref[:]
    nb, t, c = q.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    same = (rows // s) == (cols // s)  # block-diagonal: frames contiguous
    outs = []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        logits = jax.lax.dot_general(
            q[..., sl], k[..., sl], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (nb, t, t) base-2 scaled (q pre-multiplied by log2e/sqrt(d))
        logits = jnp.where(same[None], logits, -1e9)
        m = jnp.max(logits, axis=2, keepdims=True)
        p = jnp.exp2(logits - m)
        r = 1.0 / jnp.sum(p, axis=2, keepdims=True)  # (nb, t, 1)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v[..., sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        outs.append(pv * r)
    o_ref[:] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("seq", "heads", "scale", "interpret")
)
def ctg_seq_attention_pallas(qp, kp, vp, seq: int, heads: int,
                             scale: float = 1.0,
                             interpret: bool = False):
    """Packed tiles (n, T, C) of CONTIGUOUS sequences of length ``seq``;
    C = heads * d.  Returns (n, T, C).

    ``scale`` multiplies q INSIDE the kernel (callers pass the softmax
    scale x log2(e); the kernel exponentiates with exp2).  The default
    1.0 keeps the legacy contract where q arrives pre-scaled."""
    n, t, c = qp.shape
    d = c // heads
    # tiles per grid step: enough to amortise DMA issue, capped so the
    # 4 x (nb, t, c) buffers + per-head logits stay within scoped VMEM
    nb = max(1, (8 * 320) // c)
    pad_n = (-n) % nb
    if pad_n:
        qp = jnp.pad(qp, ((0, pad_n), (0, 0), (0, 0)))
        kp = jnp.pad(kp, ((0, pad_n), (0, 0), (0, 0)))
        vp = jnp.pad(vp, ((0, pad_n), (0, 0), (0, 0)))
    n_p = qp.shape[0]
    out = pl.pallas_call(
        functools.partial(_ctg_kernel, seq, heads, d, scale),
        grid=(n_p // nb,),
        in_specs=[
            pl.BlockSpec((nb, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, t, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_p, t, c), qp.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:n]


def _nat_kernel(f, P, nb, heads, d, scale, q_ref, k_ref, v_ref, o_ref):
    """Natural-layout temporal attention tile.

    Block (f, nb*P, c) cut straight from the (b*f, s, c) activation — the
    frame axis is the block's MAJOR axis, so NO HBM transpose ever happens
    (the old path materialised the (b,f,s,c)->(b*s,f,c) transpose once per
    consumer, ~0.5 ms x 10 per step in the trace).  In VMEM the block is
    regrouped to (nb, f*P, c) rows where row r = fi*P + pi; a sequence is a
    fixed position pi, so rows attend iff (r % P) == (r' % P) — an
    interleaved block-diagonal mask.  Heads live in the lane axis and are
    attended independently per in-kernel lane slice.

    Like the bounded token kernel, this kernel is per-logit VPU-bound (the
    t x t logits outnumber the t x d outputs 3x at d=40), so the softmax
    uses the same two tricks: q arrives pre-scaled by ``log2(e)/sqrt(d)``
    and the kernel exponentiates with ``exp2`` (deletes the multiply inside
    the VPU's exp lowering), and probabilities are normalised AFTER the PV
    matmul — one reciprocal-multiply per (row, d) output element instead of
    a divide per (row, t) logit."""
    t = f * P

    def rows(ref):
        x = ref[:]  # (f, nb*P, c)
        x = x.reshape(f, nb, P, ref.shape[-1])
        return x.transpose(1, 0, 2, 3).reshape(nb, t, ref.shape[-1])

    # softmax scale (x log2 e) folded into q here in VMEM: a caller-side
    # multiply cannot fuse into the Pallas custom call (one full HBM pass
    # over q per call, ~75 ms/clip of copies in the r4 trace)
    q = rows(q_ref) * jnp.asarray(scale, q_ref.dtype)
    k = rows(k_ref)
    v = rows(v_ref)
    i = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    same = (i % P) == (j % P)
    outs = []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        logits = jax.lax.dot_general(
            q[..., sl], k[..., sl], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # base-2 scaled (q pre-multiplied by log2e/sqrt(d))
        logits = jnp.where(same[None], logits, -1e9)
        m = jnp.max(logits, axis=2, keepdims=True)
        p = jnp.exp2(logits - m)
        r = 1.0 / jnp.sum(p, axis=2, keepdims=True)  # (nb, t, 1)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v[..., sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        outs.append(pv * r)
    out = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)  # (nb, t, c)
    c = o_ref.shape[-1]
    o_ref[:] = (
        out.reshape(nb, f, P, c).transpose(1, 0, 2, 3).reshape(f, nb * P, c)
    )


@functools.partial(
    jax.jit, static_argnames=("frames", "heads", "scale", "interpret")
)
def nat_temporal_attention_pallas(qbf, kbf, vbf, frames: int, heads: int,
                                  scale: float = 1.0,
                                  interpret: bool = False):
    """Temporal attention over (b*f, s, c) activations in natural layout.
    ``scale`` multiplies q INSIDE the kernel — callers pass the softmax
    scale x log2(e) (base-2 contract, see ``_nat_kernel``); the default
    1.0 keeps the legacy pre-scaled-q behaviour.
    Packs P spatial positions per tile with
    P = largest power of two <= 128 // frames (a power of two so it divides
    the spatial extent); requires s % (P*nb) == 0 — the caller gates on
    that.  For 128 % frames == 0 the f*P tile fills all 128 rows; other
    frame counts (e.g. the whole-clip 24-frame fused mode) run at
    f*P/128 row occupancy, still transpose-free."""
    bf, s, c = qbf.shape
    b = bf // frames
    d = c // heads
    P = 1 << int(math.log2(128 // frames))
    nb = max(1, (8 * 320) // c)
    while s % (P * nb):
        nb //= 2
    out = pl.pallas_call(
        functools.partial(_nat_kernel, frames, P, nb, heads, d, scale),
        grid=(b, s // (P * nb)),
        in_specs=[
            pl.BlockSpec((frames, nb * P, c), lambda bi, ci: (bi, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((frames, nb * P, c), lambda bi, ci: (bi, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((frames, nb * P, c), lambda bi, ci: (bi, ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((frames, nb * P, c), lambda bi, ci: (bi, ci, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bf, s, c), qbf.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(qbf, kbf, vbf)
    return out


def _nat_xla_core(frames, heads, scale, qbf, kbf, vbf):
    """XLA reference of the natural-layout kernel math — custom-VJP
    backward and CPU tests.  Same base-2 contract as the kernel: q arrives
    pre-scaled by ``log2(e)/sqrt(d)``, so the base-e softmax runs on
    ``logits * ln(2)`` (softmax2(x) == softmaxE(x * ln2))."""
    bf, s, c = qbf.shape
    b = bf // frames
    d = c // heads

    def split(x):  # (b*f, s, c) -> (b, s, h, f, d): seqs along f per (s, h)
        x = x.reshape(b, frames, s, heads, d)
        return x.transpose(0, 2, 3, 1, 4)

    q = split(qbf) * jnp.asarray(scale, qbf.dtype)
    k, v = split(kbf), split(vbf)
    logits = jnp.einsum(
        "bshfd,bshgd->bshfg", q, k, preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(logits * math.log(2.0), axis=-1).astype(v.dtype)
    out = jnp.einsum("bshfg,bshgd->bshfd", probs, v)
    return (
        out.transpose(0, 3, 1, 2, 4).reshape(bf, s, c).astype(qbf.dtype)
    )


def _nat_sanitize(mesh, arg_shapes, result_shapes, statics):
    """Mesh shardings for the natural-layout temporal kernel: the (b*f)
    row axis shards in whole-f groups (frames of one clip row interact);
    the spatial axis s is per-position independent and may ALSO shard —
    but only when the per-shard extent stays a multiple of the kernel's
    packing factor P (else the local pack would not tile)."""
    frames = statics[0]
    q = arg_shapes[0]
    bf, s, _ = q.shape
    ax0 = axes_of(q.sharding, 0, mesh, 3)
    ax1 = axes_of(q.sharding, 1, mesh, 3)
    b = bf // frames
    if ax0 and (b == 0 or b % prod_axes(mesh, ax0) != 0):
        ax0 = ()
    P = 1 << int(math.log2(128 // frames)) if 2 <= frames <= 64 else 1
    n1 = prod_axes(mesh, ax1)
    if ax1 and (s % n1 != 0 or (s // n1) % P != 0):
        ax1 = ()
    sh = NamedSharding(mesh, nd_spec(3, {0: ax0, 1: ax1}))
    return [sh, sh, sh], [sh]


def _nat_rule(shapes, frames, heads, interp, scale):
    n = shapes[0][0] // frames
    if n == 1:
        return "f s c, f s c, f s c -> f s c", {}
    if frames == 1:
        return "n s c, n s c, n s c -> n s c", {}
    return (
        "(n f) s c, (n f) s c, (n f) s c -> (n f) s c",
        {"f": frames, "n": n},
    )


_p_nat = make_partitioned(
    "nat_temporal",
    lambda qbf, kbf, vbf, frames, heads, interp, scale:
        nat_temporal_attention_pallas(
            qbf, kbf, vbf, frames=frames, heads=heads, scale=scale,
            interpret=interp,
        ),
    rule=_nat_rule,
    n_static=4,
    need_replication=("f", "c"),
    batch_dims=(0, 0, 0),
    sanitize=_nat_sanitize,
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def nat_packed(qbf, kbf, vbf, frames, heads, interpret, scale=1.0):
    """Differentiable natural-layout temporal attention: Pallas forward,
    backward via the XLA core's VJP (recompute; only paid when training).
    ``scale`` multiplies q inside the kernel (softmax scale + log2e)."""
    return _p_nat(qbf, kbf, vbf, frames, heads, interpret, scale)


def _nat_fwd(qbf, kbf, vbf, frames, heads, interpret, scale):
    out = nat_packed(qbf, kbf, vbf, frames, heads, interpret, scale)
    return out, (qbf, kbf, vbf)


def _nat_bwd(frames, heads, interpret, scale, res, g):
    qbf, kbf, vbf = res
    _, vjp = jax.vjp(
        lambda a, b, c: _nat_xla_core(frames, heads, scale, a, b, c),
        qbf, kbf, vbf,
    )
    return vjp(g)


nat_packed.defvjp(_nat_fwd, _nat_bwd)


def _ctg_xla_core(seq, heads, scale, qp, kp, vp):
    """XLA reference of the contiguous-pack kernel math — used for the
    custom-VJP backward and CPU tests."""
    n, t, c = qp.shape
    d = c // heads

    def split(x):  # (n, t, c) -> (n, h, t, d)
        return x.reshape(n, t, heads, d).transpose(0, 2, 1, 3)

    q = split(qp) * jnp.asarray(scale, qp.dtype)
    k, v = split(kp), split(vp)
    r = jnp.arange(t)
    same = (r[:, None] // seq) == (r[None, :] // seq)
    logits = jnp.einsum(
        "nhtd,nhsd->nhts", q, k, preferred_element_type=jnp.float32
    )
    logits = jnp.where(same[None, None], logits, -1e9)
    # base-2 contract (q pre-scaled by log2e/sqrt(d)), as _ctg_kernel
    probs = jax.nn.softmax(logits * math.log(2.0), axis=-1).astype(v.dtype)
    out = jnp.einsum("nhts,nhsd->nhtd", probs, v)
    return out.transpose(0, 2, 1, 3).reshape(n, t, c).astype(qp.dtype)


_p_ctg = make_partitioned(
    "ctg_packed",
    lambda qp, kp, vp, seq, heads, interp, scale: ctg_seq_attention_pallas(
        qp, kp, vp, seq=seq, heads=heads, scale=scale, interpret=interp
    ),
    rule="n t c, n t c, n t c -> n t c",
    n_static=4,
    need_replication=("t", "c"),
    batch_dims=(0, 0, 0),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def ctg_packed(qp, kp, vp, seq, heads, interpret, scale=1.0):
    """Differentiable contiguous-pack temporal attention: Pallas forward,
    backward via the XLA core's VJP (recompute; only paid when training).
    ``scale`` multiplies q inside the kernel (softmax scale + log2e)."""
    return _p_ctg(qp, kp, vp, seq, heads, interpret, scale)


def _ctg_fwd(qp, kp, vp, seq, heads, interpret, scale):
    out = ctg_packed(qp, kp, vp, seq, heads, interpret, scale)
    return out, (qp, kp, vp)


def _ctg_bwd(seq, heads, interpret, scale, res, g):
    qp, kp, vp = res
    _, vjp = jax.vjp(
        lambda a, b, c: _ctg_xla_core(seq, heads, scale, a, b, c), qp, kp, vp
    )
    return vjp(g)


ctg_packed.defvjp(_ctg_fwd, _ctg_bwd)


def _ssa_xla_core(seq, nv, qp, kp, vp):
    """XLA reference of the packed-tile kernel math (same masks, same
    shapes) — used for the custom-VJP backward and CPU tests."""
    t = qp.shape[1]
    r = jnp.arange(t)
    same = (r[:, None] // seq) == (r[None, :] // seq)
    valid = jnp.logical_and(
        same, jnp.logical_or((r < nv)[None, :], (r >= nv)[:, None])
    )
    logits = jax.lax.dot_general(
        qp, kp, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    logits = jnp.where(valid[None], logits, -1e9)
    probs = jax.nn.softmax(logits, axis=-1).astype(vp.dtype)
    return jax.lax.dot_general(
        probs, vp, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(qp.dtype)


_p_ssa = make_partitioned(
    "ssa_packed",
    lambda qp, kp, vp, seq, nv, interp: small_seq_attention_pallas(
        qp, kp, vp, seq=seq, n_valid_rows=nv, interpret=interp
    ),
    rule="n t d, n t d, n t d -> n t d",
    n_static=3,
    need_replication=("t", "d"),
    batch_dims=(0, 0, 0),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def ssa_packed(qp, kp, vp, seq, n_valid_rows, interpret):
    """Differentiable packed small-seq attention: Pallas forward, backward
    via the XLA core's VJP (recompute; only paid when training)."""
    return _p_ssa(qp, kp, vp, seq, n_valid_rows, interpret)


def _ssa_fwd(qp, kp, vp, seq, n_valid_rows, interpret):
    out = ssa_packed(qp, kp, vp, seq, n_valid_rows, interpret)
    return out, (qp, kp, vp)


def _ssa_bwd(seq, n_valid_rows, interpret, res, g):
    qp, kp, vp = res
    _, vjp = jax.vjp(
        lambda a, b, c: _ssa_xla_core(seq, n_valid_rows, a, b, c), qp, kp, vp
    )
    return vjp(g)


ssa_packed.defvjp(_ssa_fwd, _ssa_bwd)
