"""Pallas reference-KV attention kernel vs XLA oracle (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from aniportrait_tpu.ops.pallas_attention import (
    ref_attention_xla,
    ref_flash_attention,
)


def test_ref_flash_attention_matches_xla():
    rs = np.random.RandomState(0)
    B, F, S, L, H, D = 2, 2, 16, 8, 2, 8
    R = B * F
    q = jnp.asarray(rs.randn(R, S, H, D).astype(np.float32))
    ks = jnp.asarray(rs.randn(R, S, H, D).astype(np.float32))
    vs = jnp.asarray(rs.randn(R, S, H, D).astype(np.float32))
    kb = jnp.asarray(rs.randn(B, L, H, D).astype(np.float32))
    vb = jnp.asarray(rs.randn(B, L, H, D).astype(np.float32))
    drop = jnp.asarray(np.array([1, 0, 1, 0], np.int32))

    with jax.default_matmul_precision("highest"):
        out = ref_flash_attention(
            q, ks, vs, kb, vb, drop, rows_per_batch=F, block_q=8, interpret=True
        )
        ref = ref_attention_xla(q, ks, vs, kb, vb, drop, rows_per_batch=F)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_drop_mask_rows_ignore_bank():
    rs = np.random.RandomState(1)
    B, F, S, L, H, D = 1, 2, 8, 4, 1, 8
    R = B * F
    q = jnp.asarray(rs.randn(R, S, H, D).astype(np.float32))
    ks = jnp.asarray(rs.randn(R, S, H, D).astype(np.float32))
    vs = jnp.asarray(rs.randn(R, S, H, D).astype(np.float32))
    kb = jnp.asarray(rs.randn(B, L, H, D).astype(np.float32))
    vb = jnp.asarray(rs.randn(B, L, H, D).astype(np.float32))
    drop = jnp.asarray(np.array([1, 1], np.int32))

    out = ref_flash_attention(
        q, ks, vs, kb, vb, drop, rows_per_batch=F, block_q=8, interpret=True
    )
    out2 = ref_flash_attention(
        q, ks, vs, kb * 100, vb * 100, drop, rows_per_batch=F, block_q=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)
