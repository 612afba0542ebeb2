"""Shape/jit smoke tests for the model stack at tiny scale.

Everything is jitted (eager per-op compile is pathologically slow on this
host) and params are built once per module via jitted init.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aniportrait_tpu.models.pose_guider import PoseGuider
from aniportrait_tpu.models.unet import AniUNet
from aniportrait_tpu.models.vae import AutoencoderKL
from aniportrait_tpu.models.motion_module import MotionModule

TINY = dict(block_out_channels=(32, 64, 64, 64), attention_heads=8, cross_attention_dim=16)
B, F, HW = 2, 2, 8
KEY = jax.random.PRNGKey(0)


def tiny_pose_features(b, f):
    return [
        jnp.zeros((b, f, 8, 8, 32)),
        jnp.zeros((b, f, 4, 4, 32)),
        jnp.zeros((b, f, 2, 2, 64)),
        jnp.zeros((b, f, 1, 1, 64)),
        jnp.zeros((b, f, 1, 1, 64)),
    ]


@pytest.fixture(scope="module")
def ref_setup():
    net = AniUNet(**TINY, use_motion_module=False, has_output_head=False)
    x = jnp.zeros((B, 1, HW, HW, 4))
    t = jnp.zeros((B,), jnp.int32)
    ctx = jnp.zeros((B, 1, 16))
    params = jax.jit(lambda k: net.init(k, x, t, ctx, capture_banks=True))(KEY)
    apply = jax.jit(lambda p, x, t, c: net.apply(p, x, t, c, capture_banks=True))
    return net, params, apply


@pytest.fixture(scope="module")
def banks(ref_setup):
    net, params, apply = ref_setup
    x = jax.random.normal(KEY, (B, 1, HW, HW, 4))
    t = jnp.zeros((B,), jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 1, 16))
    _, banks = apply(params, x, t, ctx)
    return banks


@pytest.fixture(scope="module")
def denoise_setup(banks):
    net = AniUNet(**TINY, use_motion_module=True)
    x = jnp.zeros((B, F, HW, HW, 4))
    t = jnp.zeros((B,), jnp.int32)
    ctx = jnp.zeros((B, 1, 16))
    pose = tiny_pose_features(B, F)
    drop = jnp.zeros((B,), bool)
    params = jax.jit(
        lambda k: net.init(
            k, x, t, ctx, pose_cond_fea=pose, ref_banks=banks, drop_ref=drop
        )
    )(KEY)
    apply = jax.jit(
        lambda p, x, t, c, pose, banks, drop: net.apply(
            p, x, t, c, pose_cond_fea=pose, ref_banks=banks, drop_ref=drop
        )
    )
    return net, params, apply


def test_reference_unet_banks(banks):
    # 6 down + 1 mid + 9 up = 16 banks
    assert len(banks) == 16
    assert set(k.split("_")[0] for k in banks) == {"down", "mid", "up"}
    assert banks["down_0_0"].shape == (B, 64, 32)
    assert banks["mid_0"].shape == (B, 1, 64)
    for v in banks.values():
        assert np.isfinite(np.asarray(v)).all()


def test_denoising_unet_forward(denoise_setup, banks):
    net, params, apply = denoise_setup
    x = jax.random.normal(KEY, (B, F, HW, HW, 4))
    t = jnp.full((B,), 999, jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 1, 16))
    pose = tiny_pose_features(B, F)
    drop = jnp.array([True, False])
    out, _ = apply(params, x, t, ctx, pose, banks, drop)
    assert out.shape == (B, F, HW, HW, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_uncond_mask_equals_no_bank(denoise_setup, banks):
    """drop_ref=True rows == running with zero-information banks removed.

    We check that a drop_ref=True row is invariant to the bank *values*."""
    net, params, apply = denoise_setup
    x = jax.random.normal(KEY, (B, F, HW, HW, 4))
    t = jnp.zeros((B,), jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 1, 16))
    pose = tiny_pose_features(B, F)
    drop = jnp.array([True, False])
    out1, _ = apply(params, x, t, ctx, pose, banks, drop)
    banks2 = jax.tree.map(lambda b: b * 3.0 + 1.0, banks)
    out2, _ = apply(params, x, t, ctx, pose, banks2, drop)
    out1, out2 = np.asarray(out1), np.asarray(out2)
    # row 0 ignores banks -> identical; row 1 reads banks -> must differ
    np.testing.assert_allclose(out1[0], out2[0], atol=1e-5)
    assert np.abs(out1[1] - out2[1]).max() > 1e-4


def test_motion_module_zero_init_identity():
    mm = MotionModule(channels=32)
    x = jax.random.normal(KEY, (1, 4, 4, 4, 32))
    params = jax.jit(mm.init)(KEY, x)
    y = jax.jit(mm.apply)(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_motion_module_windowed_piecewise_matches_gather(monkeypatch):
    """The contiguous-window fast path (static slices + piecewise overlap
    averaging) must match the general gather/scatter fallback on the same
    overlapping table."""
    import aniportrait_tpu.models.motion_module as mm_mod

    mm = MotionModule(channels=32, heads=4)
    x = jax.random.normal(KEY, (2, 10, 4, 4, 32))
    params = mm.init(KEY, x)
    # force non-identity proj_out so windowing effects reach the output
    params = jax.tree.map(
        lambda p: p + 0.05 if p.ndim == 2 else p, params
    )
    windows = np.array([[0, 1, 2, 3], [3, 4, 5, 6], [6, 7, 8, 9]], np.int32)
    y_fast = mm.apply(params, x, windows=windows)
    monkeypatch.setattr(mm_mod, "_FORCE_GATHER_FALLBACK", True)
    y_ref = mm.apply(params, x, windows=windows)
    np.testing.assert_allclose(
        np.asarray(y_fast), np.asarray(y_ref), atol=1e-5, rtol=1e-5
    )


def test_pose_guider_shapes():
    pg = PoseGuider(noise_latent_channels=32)
    pose = jnp.zeros((1, 2, 64, 64, 3))
    variables = jax.jit(pg.init)(KEY, pose)
    fea = jax.jit(pg.apply)(variables, pose)
    shapes = [f.shape for f in fea]
    assert shapes == [
        (1, 2, 8, 8, 32),
        (1, 2, 4, 4, 32),
        (1, 2, 2, 2, 64),
        (1, 2, 1, 1, 128),
        (1, 2, 1, 1, 128),
    ]
    # zero-init final_proj => first feature map is exactly zero
    np.testing.assert_allclose(np.asarray(fea[0]), 0.0)


def test_vae_roundtrip_shapes():
    vae = AutoencoderKL(block_out_channels=(32, 32, 64, 64))
    x = jax.random.normal(KEY, (1, 32, 32, 3))
    params = jax.jit(vae.init)(KEY, x)
    mean, logvar = jax.jit(lambda p, x: vae.apply(p, x, method=vae.encode))(params, x)
    assert mean.shape == (1, 4, 4, 4)
    recon = jax.jit(lambda p, z: vae.apply(p, z, method=vae.decode))(params, mean)
    assert recon.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(recon)).all()


def test_drop_mode_static_matches_traced(denoise_setup, banks):
    """'first_half' static CFG dispatch == traced drop mask."""
    net, params, _ = denoise_setup
    x = jax.random.normal(KEY, (B, F, HW, HW, 4))
    t = jnp.zeros((B,), jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 1, 16))
    pose = tiny_pose_features(B, F)
    traced = jax.jit(
        lambda p: net.apply(
            p, x, t, ctx, pose_cond_fea=pose, ref_banks=banks,
            drop_ref=jnp.array([True, False]),
        )[0]
    )(params)
    static = jax.jit(
        lambda p: net.apply(
            p, x, t, ctx, pose_cond_fea=pose, ref_banks=banks,
            drop_mode="first_half",
        )[0]
    )(params)
    np.testing.assert_allclose(np.asarray(traced), np.asarray(static), atol=2e-5)


@pytest.mark.parametrize("b,s,h,d", [(130, 16, 8, 40), (16, 24, 8, 80), (64, 2, 4, 8)])
def test_small_seq_attention_matches_naive(b, s, h, d):
    """Packed block-diagonal small-seq attention (motion-module temporal
    path) must equal plain per-sequence softmax attention, including at
    row counts that need tile padding and seq lengths not dividing 128."""
    import jax.numpy as jnp

    from aniportrait_tpu.ops.attention import (
        scaled_dot_product_attention,
        small_seq_attention,
    )

    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(b, s, h, d).astype(np.float32))
    k = jnp.asarray(rs.randn(b, s, h, d).astype(np.float32))
    v = jnp.asarray(rs.randn(b, s, h, d).astype(np.float32))

    ref = scaled_dot_product_attention(q, k, v, impl="naive")
    got = small_seq_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)


def test_single_kv_token_attention_is_v_broadcast():
    """Cross-attention with one KV token (the CLIP image embed) reduces to
    broadcasting V: softmax over a single logit is 1."""
    import jax.numpy as jnp

    from aniportrait_tpu.ops.attention import scaled_dot_product_attention

    rs = np.random.RandomState(3)
    q = jnp.asarray(rs.randn(2, 64, 4, 16).astype(np.float32))
    k = jnp.asarray(rs.randn(2, 1, 4, 16).astype(np.float32))
    v = jnp.asarray(rs.randn(2, 1, 4, 16).astype(np.float32))
    fast = scaled_dot_product_attention(q, k, v)
    ref = scaled_dot_product_attention(q, k, v, impl="naive")
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-6)


def test_encoder_decoder_split_is_bit_exact(denoise_setup, banks):
    """mode='encode' then mode='decode' must equal mode='full' bitwise —
    the exactness contract of the opt-in encoder cache."""
    net, params, _ = denoise_setup
    x = jnp.ones((B, F, HW, HW, 4)) * 0.1
    t = jnp.full((B,), 7, jnp.int32)
    ctx = jnp.ones((B, 1, 16)) * 0.2
    pose = tiny_pose_features(B, F)
    drop = jnp.zeros((B,), bool)
    kw = dict(pose_cond_fea=pose, ref_banks=banks, drop_ref=drop)
    full, _ = net.apply(params, x, t, ctx, **kw)
    enc, _ = net.apply(params, x, t, ctx, **kw, mode="encode")
    dec, _ = net.apply(params, x, t, ctx, **kw, mode="decode",
                       enc_features=enc)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(dec))
