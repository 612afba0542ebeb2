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


def test_flash_uneven_lengths_match_xla():
    """Sq/Skv not multiples of the block sizes: padding must be masked out."""
    rs = np.random.RandomState(2)
    R, S, L, H, D = 2, 100, 36, 2, 8
    q = jnp.asarray(rs.randn(R, S, H, D).astype(np.float32))
    ks = jnp.asarray(rs.randn(R, S, H, D).astype(np.float32))
    vs = jnp.asarray(rs.randn(R, S, H, D).astype(np.float32))
    kb = jnp.asarray(rs.randn(R, L, H, D).astype(np.float32))
    vb = jnp.asarray(rs.randn(R, L, H, D).astype(np.float32))
    drop = jnp.asarray(np.array([0, 1], np.int32))

    with jax.default_matmul_precision("highest"):
        out = ref_flash_attention(
            q, ks, vs, kb, vb, drop, rows_per_batch=1, block_q=64, interpret=True
        )
        ref = ref_attention_xla(q, ks, vs, kb, vb, drop, rows_per_batch=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_backward_matches_xla():
    """Flash custom-VJP grads vs XLA autodiff grads (incl. bank-drop mask)."""
    from aniportrait_tpu.ops.pallas_attention import flash_attention

    rs = np.random.RandomState(3)
    R, S, L, H, D = 2, 24, 12, 2, 8
    q = jnp.asarray(rs.randn(R, S, H, D).astype(np.float32))
    k = jnp.asarray(rs.randn(R, S + L, H, D).astype(np.float32))
    v = jnp.asarray(rs.randn(R, S + L, H, D).astype(np.float32))
    drop = jnp.asarray(np.array([1, 0], np.int32))
    g = jnp.asarray(rs.randn(R, S, H, D).astype(np.float32))

    def loss_flash(q, k, v):
        out = flash_attention(
            q, k, v, drop_tail=drop, kv_split=S, block_q=8, block_kv=16,
            interpret=True,
        )
        return jnp.sum(out * g)

    def loss_xla(q, k, v):
        is_bank = jnp.arange(S + L) >= S
        bias = jnp.where(
            drop.astype(bool)[:, None, None, None] & is_bank[None, None, None, :],
            -1e9, 0.0,
        )
        return jnp.sum(jax.nn.dot_product_attention(q, k, v, bias=bias) * g)

    with jax.default_matmul_precision("highest"):
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3,
            err_msg=f"grad mismatch: d{name}",
        )


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


import pytest


@pytest.mark.parametrize("b,s,h,d", [(130, 16, 8, 40), (16, 24, 8, 80)])
def test_small_seq_pallas_matches_xla(b, s, h, d):
    """Pallas packed small-seq kernel (interpret mode) == XLA packed path,
    and its custom-VJP gradients == autodiff through the XLA math."""
    import jax
    import jax.numpy as jnp

    from aniportrait_tpu.ops.attention import small_seq_attention

    rs = np.random.RandomState(1)
    q = jnp.asarray(rs.randn(b, s, h, d).astype(np.float32))
    k = jnp.asarray(rs.randn(b, s, h, d).astype(np.float32))
    v = jnp.asarray(rs.randn(b, s, h, d).astype(np.float32))

    ref = small_seq_attention(q, k, v, impl="xla")
    got = small_seq_attention(q, k, v, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)

    def loss_p(q, k, v):
        return jnp.sum(small_seq_attention(q, k, v, impl="pallas") ** 2)

    def loss_x(q, k, v):
        return jnp.sum(small_seq_attention(q, k, v, impl="xla") ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, r in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=5e-4,
                                   rtol=1e-3)


@pytest.mark.parametrize("b,f,s,c,heads", [(2, 16, 64, 320, 8), (2, 8, 48, 640, 8)])
def test_natural_temporal_pallas_matches_xla(b, f, s, c, heads):
    """Natural-layout temporal kernel (interpret mode) == XLA core math ==
    the token-layout fallback; custom-VJP gradients == XLA autodiff."""
    import jax
    import jax.numpy as jnp

    from aniportrait_tpu.ops.attention import (
        scaled_dot_product_attention,
        temporal_attention_4d,
    )
    from aniportrait_tpu.ops.pallas_attention import (
        _nat_xla_core,
        nat_packed,
        nat_temporal_attention_pallas,
    )

    d = c // heads
    rs = np.random.RandomState(2)
    q = jnp.asarray(rs.randn(b, f, s, c).astype(np.float32))
    k = jnp.asarray(rs.randn(b, f, s, c).astype(np.float32))
    v = jnp.asarray(rs.randn(b, f, s, c).astype(np.float32))

    # base-2 contract: kernel + XLA core take q pre-scaled by log2e/sqrt(d)
    scale = np.log2(np.e) * d ** -0.5
    qs = (q * scale).reshape(b * f, s, c)
    kf = k.reshape(b * f, s, c)
    vf = v.reshape(b * f, s, c)

    got = nat_temporal_attention_pallas(qs, kf, vf, frames=f, heads=heads,
                                        interpret=True)
    ref = _nat_xla_core(f, heads, 1.0, qs, kf, vf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)

    # in-kernel scale fold == caller-side prescale
    got_s = nat_temporal_attention_pallas(
        q.reshape(b * f, s, c), kf, vf, frames=f, heads=heads,
        scale=float(scale), interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)

    # the XLA core must itself equal the generic token-layout attention
    def tok(x):
        return x.transpose(0, 2, 1, 3).reshape(b * s, f, heads, d)

    ref2 = scaled_dot_product_attention(tok(q), tok(k), tok(v), impl="naive")
    ref2 = ref2.reshape(b, s, f, c).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(
        np.asarray(ref.reshape(b, f, s, c)), np.asarray(ref2), atol=2e-5,
        rtol=1e-4,
    )

    # dispatch-level fallback agrees too
    disp = temporal_attention_4d(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(disp), np.asarray(ref2), atol=2e-5,
                               rtol=1e-4)

    def loss_p(a, bb, cc):
        return jnp.sum(nat_packed(a, bb, cc, f, heads, True) ** 2)

    def loss_x(a, bb, cc):
        return jnp.sum(_nat_xla_core(f, heads, 1.0, a, bb, cc) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(qs, kf, vf)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(qs, kf, vf)
    for a, r in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=5e-4,
                                   rtol=1e-3)


def test_tokens_flash_matches_xla():
    """Token-layout kernel (heads sliced in-kernel from the channel axis)
    vs plain attention, incl. uneven KV length (tail mask)."""
    from aniportrait_tpu.ops.pallas_attention import flash_attention_tokens

    rs = np.random.RandomState(3)
    B, SQ, SKV, H, D = 2, 40, 50, 2, 8
    C = H * D
    q = jnp.asarray(rs.randn(B, SQ, C).astype(np.float32))
    k = jnp.asarray(rs.randn(B, SKV, C).astype(np.float32))
    v = jnp.asarray(rs.randn(B, SKV, C).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        out = flash_attention_tokens(
            q, k, v, heads=H, block_q=16, block_kv=16, interpret=True
        )
        ref = jax.nn.dot_product_attention(
            q.reshape(B, SQ, H, D), k.reshape(B, SKV, H, D),
            v.reshape(B, SKV, H, D),
        ).reshape(B, SQ, C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_tokens_flash_grad_matches_xla():
    """tok_flash custom VJP (backward recomputes via the folded flash)."""
    from aniportrait_tpu.ops.pallas_attention import tok_flash

    rs = np.random.RandomState(4)
    B, S, H, D = 1, 32, 2, 8
    C = H * D
    q = jnp.asarray(rs.randn(B, S, C).astype(np.float32))
    k = jnp.asarray(rs.randn(B, S, C).astype(np.float32))
    v = jnp.asarray(rs.randn(B, S, C).astype(np.float32))

    def loss_tok(q, k, v):
        return jnp.sum(tok_flash(q, k, v, H, 16, 16, True) ** 2)

    def loss_ref(q, k, v):
        o = jax.nn.dot_product_attention(
            q.reshape(B, S, H, D), k.reshape(B, S, H, D), v.reshape(B, S, H, D)
        )
        return jnp.sum(o.reshape(B, S, C) ** 2)

    with jax.default_matmul_precision("highest"):
        g1 = jax.grad(loss_tok, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3)


def test_noshift_tokens_flash_matches_plain():
    """Shift-free fast path (pre-scaled q, MXU row-sums) == running-max
    kernel to f32 precision; includes uneven KV tail."""
    from aniportrait_tpu.ops.pallas_attention import (
        flash_attention_tokens,
        flash_attention_tokens_noshift,
    )

    rs = np.random.RandomState(5)
    B, SQ, SKV, H, D = 2, 40, 50, 2, 8
    C = H * D
    q = jnp.asarray(rs.randn(B, SQ, C).astype(np.float32))
    k = jnp.asarray(rs.randn(B, SKV, C).astype(np.float32))
    v = jnp.asarray(rs.randn(B, SKV, C).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        ref = flash_attention_tokens(
            q, k, v, heads=H, block_q=16, block_kv=16, interpret=True
        )
        out = flash_attention_tokens_noshift(
            q, k, v, heads=H, block_q=16, block_kv=16, interpret=True
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_noshift_tokens_flash_orthogonal_qk_exact():
    """Huge-norm but orthogonal q/k (true logits 0): exp(0)=1 needs no
    shift — the fast path itself must return the exact uniform average."""
    rs = np.random.RandomState(6)
    from aniportrait_tpu.ops.pallas_attention import (
        flash_attention_tokens_noshift,
    )

    B, S, H, D = 1, 16, 1, 8
    C = H * D
    q = np.zeros((B, S, C), np.float32)
    q[..., 0] = 1e4
    k = np.zeros((B, S, C), np.float32)
    k[..., 1] = 1e4
    v = rs.randn(B, S, C).astype(np.float32)
    q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    with jax.default_matmul_precision("highest"):
        out = flash_attention_tokens_noshift(
            q, k, v, heads=H, block_q=16, block_kv=16, interpret=True
        )
    uniform = np.broadcast_to(
        np.asarray(jnp.mean(v, 1, keepdims=True)), out.shape
    )
    np.testing.assert_allclose(np.asarray(out), uniform, atol=2e-5, rtol=1e-4)


def test_noshift_tokens_flash_guard_fallback_overflow():
    """Logits past f32 exp range (aligned huge q/k -> exp(+big) = inf):
    the l-guard must reroute to the running-max kernel and still return
    the exact result (one-hot attention on the dominant token)."""
    from aniportrait_tpu.ops.pallas_attention import (
        flash_attention_tokens,
        flash_attention_tokens_noshift,
    )

    rs = np.random.RandomState(7)
    B, S, H, D = 1, 16, 1, 8
    C = H * D
    q = np.zeros((B, S, C), np.float32)
    q[..., 0] = 1e3
    k = (0.01 * rs.randn(B, S, C)).astype(np.float32)
    k[:, 3, 0] = 1.0  # dominant token: logit 1e3/sqrt(8) >> 88, exp -> inf
    v = rs.randn(B, S, C).astype(np.float32)
    q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    with jax.default_matmul_precision("highest"):
        ref = flash_attention_tokens(
            q, k, v, heads=H, block_q=16, block_kv=16, interpret=True
        )
        out = flash_attention_tokens_noshift(
            q, k, v, heads=H, block_q=16, block_kv=16, interpret=True
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)
    # attention collapses onto the dominant token
    np.testing.assert_allclose(
        np.asarray(out),
        np.broadcast_to(np.asarray(v[:, 3:4]), out.shape),
        atol=2e-4, rtol=1e-3,
    )


def test_bounded_tokens_flash_matches_plain():
    """Bounded-softmax fast path (fixed per-row Cauchy-Schwarz shift) ==
    running-max kernel to f32 precision; includes uneven KV tail."""
    from aniportrait_tpu.ops.pallas_attention import (
        flash_attention_tokens,
        flash_attention_tokens_bounded,
    )

    rs = np.random.RandomState(8)
    B, H, D = 2, 4, 16
    C = H * D
    for sq, skv in [(32, 32), (32, 48), (48, 40)]:
        q = jnp.asarray(rs.randn(B, sq, C).astype(np.float32))
        k = jnp.asarray(rs.randn(B, skv, C).astype(np.float32))
        v = jnp.asarray(rs.randn(B, skv, C).astype(np.float32))
        with jax.default_matmul_precision("highest"):
            ref = flash_attention_tokens(
                q, k, v, heads=H, block_q=16, block_kv=16, interpret=True
            )
            out = flash_attention_tokens_bounded(
                q, k, v, heads=H, block_q=16, block_kv=16, interpret=True
            )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
        )


def test_bounded_tokens_flash_guard_fallback():
    """When the Cauchy-Schwarz bound is loose enough to underflow the
    softmax (l -> 0), the guard must reroute to the running-max kernel and
    still return the exact result."""
    from aniportrait_tpu.ops.pallas_attention import (
        flash_attention_tokens,
        flash_attention_tokens_bounded,
    )

    rs = np.random.RandomState(6)
    B, S, H, D = 1, 16, 1, 8
    C = H * D
    # q has a huge norm along e0; k lives in the orthogonal complement with
    # a huge norm along e1: true logits are 0 but the norm-product bound is
    # ~1e8/sqrt(8) >> 87, so exp underflows and l == 0 in the fast path.
    q = np.zeros((B, S, C), np.float32)
    q[..., 0] = 1e4
    k = np.zeros((B, S, C), np.float32)
    k[..., 1] = 1e4
    v = rs.randn(B, S, C).astype(np.float32)
    q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    with jax.default_matmul_precision("highest"):
        ref = flash_attention_tokens(
            q, k, v, heads=H, block_q=16, block_kv=16, interpret=True
        )
        out = flash_attention_tokens_bounded(
            q, k, v, heads=H, block_q=16, block_kv=16, interpret=True
        )
    # all logits equal -> uniform average of v
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
    )
    uniform = np.broadcast_to(
        np.asarray(jnp.mean(v, 1, keepdims=True)), out.shape
    )
    np.testing.assert_allclose(np.asarray(out), uniform, atol=2e-5, rtol=1e-4)


def test_unshifted_tokens_flash_matches_plain():
    """Unshifted exp2 fast path (no softmax shift at all) == running-max
    kernel to f32 precision; includes uneven KV tail."""
    from aniportrait_tpu.ops.pallas_attention import (
        flash_attention_tokens,
        flash_attention_tokens_unshifted,
    )

    rs = np.random.RandomState(9)
    B, H, D = 2, 4, 16
    C = H * D
    for sq, skv in [(32, 32), (32, 48), (48, 40)]:
        q = jnp.asarray(rs.randn(B, sq, C).astype(np.float32))
        k = jnp.asarray(rs.randn(B, skv, C).astype(np.float32))
        v = jnp.asarray(rs.randn(B, skv, C).astype(np.float32))
        with jax.default_matmul_precision("highest"):
            ref = flash_attention_tokens(
                q, k, v, heads=H, block_q=16, block_kv=16, interpret=True
            )
            out = flash_attention_tokens_unshifted(
                q, k, v, heads=H, block_q=16, block_kv=16, interpret=True
            )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
        )


def test_unshifted_tokens_flash_guard_fallback_overflow():
    """Logits past the f32 exp2 range (aligned huge q/k -> exp2(+big) =
    inf): the finiteness guard must reroute to the running-max kernel and
    still return the exact result (one-hot attention on the dominant
    token)."""
    from aniportrait_tpu.ops.pallas_attention import (
        flash_attention_tokens,
        flash_attention_tokens_unshifted,
    )

    rs = np.random.RandomState(10)
    B, S, H, D = 1, 16, 1, 8
    C = H * D
    q = np.zeros((B, S, C), np.float32)
    q[..., 0] = 1e3
    k = (0.01 * rs.randn(B, S, C)).astype(np.float32)
    k[:, 3, 0] = 1.0  # dominant token: logit2 >> 127, exp2 -> inf
    v = rs.randn(B, S, C).astype(np.float32)
    q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    with jax.default_matmul_precision("highest"):
        ref = flash_attention_tokens(
            q, k, v, heads=H, block_q=16, block_kv=16, interpret=True
        )
        out = flash_attention_tokens_unshifted(
            q, k, v, heads=H, block_q=16, block_kv=16, interpret=True
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out),
        np.broadcast_to(np.asarray(v[:, 3:4]), out.shape),
        atol=2e-4, rtol=1e-3,
    )


def test_unshifted_tokens_flash_guard_fallback_underflow():
    """A row whose every logit2 is below -126 flushes l to zero without a
    shift; the l-guard must reroute to the running-max kernel."""
    from aniportrait_tpu.ops.pallas_attention import (
        flash_attention_tokens,
        flash_attention_tokens_unshifted,
    )

    rs = np.random.RandomState(11)
    B, S, H, D = 1, 16, 1, 8
    C = H * D
    # strongly anti-aligned q/k: all logits ~ -1e3 -> exp2 flushes to 0
    q = np.zeros((B, S, C), np.float32)
    q[..., 0] = 1e3
    k = np.zeros((B, S, C), np.float32)
    k[..., 0] = -1.0
    v = rs.randn(B, S, C).astype(np.float32)
    q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    with jax.default_matmul_precision("highest"):
        ref = flash_attention_tokens(
            q, k, v, heads=H, block_q=16, block_kv=16, interpret=True
        )
        out = flash_attention_tokens_unshifted(
            q, k, v, heads=H, block_q=16, block_kv=16, interpret=True
        )
    # all logits equal -> uniform average of v
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
    )
    uniform = np.broadcast_to(
        np.asarray(jnp.mean(v, 1, keepdims=True)), out.shape
    )
    np.testing.assert_allclose(np.asarray(out), uniform, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize(
    "B,SQ,SS,SB,rep",
    [
        (4, 40, 40, 40, 2),    # even segments, shared bank rows
        (2, 40, 48, 30, 1),    # masked bank tail
        (4, 32, 20, 48, 4),    # masked self tail, bank longer than self
    ],
)
def test_banked_tokens_flash_matches_concat(B, SQ, SS, SB, rep):
    """Two-segment (self + reference bank) kernel == attention over the
    materialised ``concat([k, repeat(bank)])`` (the form the reference
    builds every step at mutual_self_attention.py:147-165)."""
    from aniportrait_tpu.ops.pallas_attention import (
        _banked_concat,
        tok_flash_banked,
    )

    rs = np.random.RandomState(5)
    H, D = 2, 8
    C = H * D
    q = jnp.asarray(rs.randn(B, SQ, C).astype(np.float32))
    k = jnp.asarray(rs.randn(B, SS, C).astype(np.float32))
    v = jnp.asarray(rs.randn(B, SS, C).astype(np.float32))
    kb = jnp.asarray(rs.randn(B // rep, SB, C).astype(np.float32))
    vb = jnp.asarray(rs.randn(B // rep, SB, C).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        out = tok_flash_banked(
            q, k, v, kb, vb, H, rep, block_q=16, block_kv=16, interpret=True
        )
        kc, vc = _banked_concat(k, v, kb, vb, rep)
        skv = kc.shape[1]
        ref = jax.nn.dot_product_attention(
            q.reshape(B, SQ, H, D), kc.reshape(B, skv, H, D),
            vc.reshape(B, skv, H, D),
        ).reshape(B, SQ, C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_banked_tokens_flash_guard_fallback():
    """Underflowing logits (exp2 flush) must trip the banked kernel's
    denominator guard and recompute exactly via the running-max fallback."""
    from aniportrait_tpu.ops.pallas_attention import (
        _banked_concat,
        flash_attention_tokens,
        tok_flash_banked,
    )

    B, S, H, D = 2, 16, 1, 8
    C = H * D
    rs = np.random.RandomState(6)
    q = np.zeros((B, S, C), np.float32)
    q[..., 0] = 1e3
    k = np.zeros((B, S, C), np.float32)
    k[..., 0] = -1.0
    kb = np.zeros((B, S, C), np.float32)
    kb[..., 0] = -1.0
    v = rs.randn(B, S, C).astype(np.float32)
    vb = rs.randn(B, S, C).astype(np.float32)
    q, k, v, kb, vb = map(jnp.asarray, (q, k, v, kb, vb))
    with jax.default_matmul_precision("highest"):
        out = tok_flash_banked(
            q, k, v, kb, vb, H, 1, block_q=16, block_kv=16, interpret=True
        )
        kc, vc = _banked_concat(k, v, kb, vb, 1)
        ref = flash_attention_tokens(
            q, kc, vc, heads=H, block_q=16, block_kv=16, interpret=True
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_banked_tokens_flash_grad_matches_concat():
    """Banked custom VJP == grads of the concat formulation."""
    from aniportrait_tpu.ops.pallas_attention import (
        _banked_concat,
        tok_flash_banked,
    )

    rs = np.random.RandomState(7)
    B, S, H, D, rep = 2, 16, 2, 8, 2
    C = H * D
    q = jnp.asarray(rs.randn(B, S, C).astype(np.float32))
    k = jnp.asarray(rs.randn(B, S, C).astype(np.float32))
    v = jnp.asarray(rs.randn(B, S, C).astype(np.float32))
    kb = jnp.asarray(rs.randn(B // rep, S, C).astype(np.float32))
    vb = jnp.asarray(rs.randn(B // rep, S, C).astype(np.float32))

    def loss_banked(q, k, v, kb, vb):
        return jnp.sum(
            tok_flash_banked(q, k, v, kb, vb, H, rep, 16, 16, True) ** 2
        )

    def loss_ref(q, k, v, kb, vb):
        kc, vc = _banked_concat(k, v, kb, vb, rep)
        skv = kc.shape[1]
        o = jax.nn.dot_product_attention(
            q.reshape(B, S, H, D), kc.reshape(B, skv, H, D),
            vc.reshape(B, skv, H, D),
        )
        return jnp.sum(o.reshape(B, S, C) ** 2)

    with jax.default_matmul_precision("highest"):
        g1 = jax.grad(loss_banked, argnums=(0, 1, 2, 3, 4))(q, k, v, kb, vb)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, kb, vb)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3)


def test_transposed_tokens_flash_matches_standard():
    """Channel-major (B, C, S) operand kernel == token-major kernel ==
    XLA oracle; includes uneven KV tails (pad/mask on the lane axis)."""
    from aniportrait_tpu.ops.pallas_attention import (
        flash_attention_tokens,
        flash_attention_tokens_unshifted,
    )

    rs = np.random.RandomState(11)
    B, H, D = 2, 4, 16
    C = H * D
    for sq, skv in [(32, 32), (32, 48), (48, 40)]:
        q = jnp.asarray(rs.randn(B, sq, C).astype(np.float32))
        k = jnp.asarray(rs.randn(B, skv, C).astype(np.float32))
        v = jnp.asarray(rs.randn(B, skv, C).astype(np.float32))
        with jax.default_matmul_precision("highest"):
            ref = flash_attention_tokens(
                q, k, v, heads=H, block_q=16, block_kv=16, interpret=True
            )
            out = flash_attention_tokens_unshifted(
                jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                jnp.swapaxes(v, 1, 2),
                heads=H, block_q=16, block_kv=16, interpret=True,
                transposed=True,
            )
        assert out.shape == (B, sq, C)  # output stays token-major
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
        )


def test_transposed_tokens_flash_grad_matches_oracle():
    """tok_flash_t custom VJP == grads of the XLA oracle, with the
    channel-major operand convention (grads come back channel-major)."""
    from aniportrait_tpu.ops.pallas_attention import tok_flash_t

    rs = np.random.RandomState(12)
    B, S, H, D = 2, 16, 2, 8
    C = H * D
    qt = jnp.asarray(rs.randn(B, C, S).astype(np.float32))
    kt = jnp.asarray(rs.randn(B, C, S).astype(np.float32))
    vt = jnp.asarray(rs.randn(B, C, S).astype(np.float32))

    def loss_t(qt, kt, vt):
        return jnp.sum(tok_flash_t(qt, kt, vt, H, 16, 16, True) ** 2)

    def loss_ref(qt, kt, vt):
        q, k, v = (jnp.swapaxes(t, 1, 2) for t in (qt, kt, vt))
        o = jax.nn.dot_product_attention(
            q.reshape(B, S, H, D), k.reshape(B, S, H, D),
            v.reshape(B, S, H, D),
        )
        return jnp.sum(o.reshape(B, S, C) ** 2)

    with jax.default_matmul_precision("highest"):
        g1 = jax.grad(loss_t, argnums=(0, 1, 2))(qt, kt, vt)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(qt, kt, vt)
    for a, b in zip(g1, g2):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=1e-3)


@pytest.mark.parametrize("B,SQ,SS,SB,rep", [
    (2, 16, 16, 16, 1),
    (4, 32, 32, 16, 2),
    (2, 32, 24, 40, 2),
])
def test_transposed_banked_matches_standard(B, SQ, SS, SB, rep):
    """Channel-major banked two-segment kernel == token-major banked kernel
    (both guarded-exact against the concat form)."""
    from aniportrait_tpu.ops.pallas_attention import (
        tok_flash_banked,
        tok_flash_banked_t,
    )

    rs = np.random.RandomState(13)
    H, D = 2, 8
    C = H * D
    q = jnp.asarray(rs.randn(B, SQ, C).astype(np.float32))
    k = jnp.asarray(rs.randn(B, SS, C).astype(np.float32))
    v = jnp.asarray(rs.randn(B, SS, C).astype(np.float32))
    kb = jnp.asarray(rs.randn(B // rep, SB, C).astype(np.float32))
    vb = jnp.asarray(rs.randn(B // rep, SB, C).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        ref = tok_flash_banked(q, k, v, kb, vb, H, rep, 16, 16, True)
        out = tok_flash_banked_t(
            *(jnp.swapaxes(t, 1, 2) for t in (q, k, v, kb, vb)),
            H, rep, 16, 16, True,
        )
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
    )


def test_transposed_banked_grad_matches_concat():
    """tok_flash_banked_t custom VJP == concat-form grads, channel-major."""
    from aniportrait_tpu.ops.pallas_attention import (
        _banked_concat,
        tok_flash_banked_t,
    )

    rs = np.random.RandomState(14)
    B, S, H, D, rep = 2, 16, 2, 8, 2
    C = H * D
    q = jnp.asarray(rs.randn(B, S, C).astype(np.float32))
    k = jnp.asarray(rs.randn(B, S, C).astype(np.float32))
    v = jnp.asarray(rs.randn(B, S, C).astype(np.float32))
    kb = jnp.asarray(rs.randn(B // rep, S, C).astype(np.float32))
    vb = jnp.asarray(rs.randn(B // rep, S, C).astype(np.float32))
    ts = tuple(jnp.swapaxes(t, 1, 2) for t in (q, k, v, kb, vb))

    def loss_t(*ts):
        return jnp.sum(tok_flash_banked_t(*ts, H, rep, 16, 16, True) ** 2)

    def loss_ref(q, k, v, kb, vb):
        kc, vc = _banked_concat(k, v, kb, vb, rep)
        skv = kc.shape[1]
        o = jax.nn.dot_product_attention(
            q.reshape(B, S, H, D), kc.reshape(B, skv, H, D),
            vc.reshape(B, skv, H, D),
        )
        return jnp.sum(o.reshape(B, S, C) ** 2)

    with jax.default_matmul_precision("highest"):
        g1 = jax.grad(loss_t, argnums=(0, 1, 2, 3, 4))(*ts)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, kb, vb)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(jnp.swapaxes(b, 1, 2)), atol=2e-4,
            rtol=1e-3,
        )
