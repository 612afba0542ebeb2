"""Block-wise 8-bit AdamW (optax transformation).

The reference trains both stages with bitsandbytes' 8-bit Adam
(``train_stage_1.py:366-376``, ``use_8bit_adam``): Adam's first/second
moments are stored block-wise quantized to int8, cutting optimizer state
from 8 to ~2 bytes per parameter.  That is not a convenience there — at
stage-1 scale (~1.6e9 trainable parameters: ReferenceNet + denoising
UNet + PoseGuider) full-precision moments alone are ~13 GB, and the
measured stage-1 batch-2 step OOMs a 16 GiB v5e chip by 8.8 GiB
(docs/memory_r5.json).  This module is the TPU-native equivalent:

* moments live as ``int8`` with one ``f32`` absmax scale per
  ``block_size`` contiguous elements (bitsandbytes uses a dynamic-map
  codebook; absmax-per-block reaches similar fidelity at block 256 and
  stays a pure elementwise XLA op — no lookup tables, fuses into the
  update);
* each update dequantizes, runs exact f32 AdamW math (bias correction,
  eps, decoupled weight decay), requantizes — the transient f32 moments
  are XLA temps inside one fused update, never persistent HBM;
* API-compatible with ``optax.adamw`` inside ``optax.chain`` /
  ``multi_transform`` (used by ``train_step.make_optimizer``).

Quantization error: absmax int8 gives ~2 decimal digits per block.
Per-step moment noise is zero-mean relative to the f32 trajectory;
measured drift on test problems stays within tolerance bands
(tests/test_train_features.py::test_adamw8bit_tracks_fp32).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class _QMoment(NamedTuple):
    q: jnp.ndarray  # int8, shape (padded_len,)
    scale: jnp.ndarray  # f32, shape (n_blocks,)


class Adam8bitState(NamedTuple):
    count: jnp.ndarray
    m: object  # pytree of _QMoment
    v: object  # pytree of _QMoment


def _quantize(x_flat: jnp.ndarray, block: int) -> _QMoment:
    n = x_flat.shape[0]
    blocks = x_flat.reshape(n // block, block)
    absmax = jnp.max(jnp.abs(blocks), axis=1)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(
        jnp.round(blocks / scale[:, None]), -127, 127
    ).astype(jnp.int8)
    return _QMoment(q.reshape(-1), scale.astype(jnp.float32))


def _dequantize(qm: _QMoment, block: int) -> jnp.ndarray:
    q = qm.q.reshape(-1, block).astype(jnp.float32)
    return (q * qm.scale[:, None]).reshape(-1)


def _padded_len(n: int, block: int) -> int:
    return -(-n // block) * block


def adamw8bit(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
    block_size: int = 256,
) -> optax.GradientTransformation:
    """AdamW with int8 block-quantized moments (~2 bytes/param of
    persistent optimizer state instead of 8)."""

    def init(params):
        def one(p):
            n = _padded_len(p.size, block_size)
            return _QMoment(
                jnp.zeros((n,), jnp.int8),
                jnp.ones((n // block_size,), jnp.float32),
            )

        zeros = jax.tree.map(one, params)
        return Adam8bitState(
            count=jnp.zeros((), jnp.int32),
            m=zeros,
            v=jax.tree.map(one, params),
        )

    def update(grads, state, params):
        if params is None:
            raise ValueError("adamw8bit requires params (weight decay)")
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def one(g, p, mq, vq):
            n = g.size
            pad = _padded_len(n, block_size) - n
            gf = jnp.pad(
                g.reshape(-1).astype(jnp.float32), (0, pad)
            )
            m = b1 * _dequantize(mq, block_size) + (1.0 - b1) * gf
            v = b2 * _dequantize(vq, block_size) + (1.0 - b2) * gf * gf
            mhat = m / c1
            vhat = v / c2
            upd = mhat / (jnp.sqrt(vhat) + eps)
            upd = upd[:n].reshape(g.shape)
            upd = upd + weight_decay * p.astype(jnp.float32)
            return (
                (-learning_rate * upd).astype(p.dtype),
                _quantize(m, block_size),
                _quantize(v, block_size),
            )

        flat_g, treedef = jax.tree.flatten(grads)
        flat_p = treedef.flatten_up_to(params)
        flat_m = treedef.flatten_up_to(state.m)
        flat_v = treedef.flatten_up_to(state.v)
        out = [one(g, p, m, v)
               for g, p, m, v in zip(flat_g, flat_p, flat_m, flat_v)]
        updates = treedef.unflatten([o[0] for o in out])
        new_m = treedef.unflatten([o[1] for o in out])
        new_v = treedef.unflatten([o[2] for o in out])
        return updates, Adam8bitState(count, new_m, new_v)

    return optax.GradientTransformation(init, update)
