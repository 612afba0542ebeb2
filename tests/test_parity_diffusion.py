"""Numerical parity of the diffusion core vs torch oracles, THROUGH the
weight converter (VERDICT r1 'Next round' item 3).

Each test: random-init the torch oracle (reference state_dict naming) ->
convert with the repo's converter rules -> run the flax module -> compare.
This validates both the module math and the converter mapping for every
module class the real checkpoints flow through.

Oracles: tests/oracles/diffusion_torch.py (reference math, file:line cited
there). f32, highest matmul precision, tolerance 2e-4.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from aniportrait_tpu.models.motion_module import MotionModule
from aniportrait_tpu.models.pose_guider import PoseGuider
from aniportrait_tpu.models.resnet import ResnetBlock3D
from aniportrait_tpu.models.transformer_spatial import SpatialTransformer
from aniportrait_tpu.schedulers import DDIMScheduler
from aniportrait_tpu.weights.convert import (
    _attention_block_rules,
    _motion_rules,
    _resnet_rules,
    apply_rules,
    convert_pose_guider,
)
from tests.oracles import diffusion_torch as oracle


def _rand_init(module, seed=0, std=0.05):
    g = torch.Generator().manual_seed(seed)
    for p in module.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * std)
    return module.eval()


def _wrap(name, module):
    holder = torch.nn.Module()
    setattr(holder, name, module)
    return holder


def _nchw5(x):  # (b, f, h, w, c) numpy -> torch (b, c, f, h, w)
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 4, 1, 2, 3)))


def _to_bfhwc(t):  # torch (b, c, f, h, w) -> numpy (b, f, h, w, c)
    return t.detach().numpy().transpose(0, 2, 3, 4, 1)


def test_resnet_block_3d_parity():
    cin, cout, temb_c = 32, 64, 128
    t_mod = _rand_init(oracle.ResnetBlock3D(cin, cout, temb_channels=temb_c))
    params, _, unused = apply_rules(
        _wrap("res", t_mod).state_dict(), _resnet_rules("res", "res")
    )
    assert not unused, unused

    rs = np.random.RandomState(0)
    x = rs.randn(2, 2, 8, 8, cin).astype(np.float32)
    # reference unet_3d passes temb of shape (b, c); ResnetBlock3D broadcasts
    # it over frames via [:, :, None, None, None] (resnet.py:195-199)
    temb = rs.randn(2, temb_c).astype(np.float32)

    with torch.no_grad():
        ref = _to_bfhwc(t_mod(_nchw5(x), torch.from_numpy(temb)))

    flax_mod = ResnetBlock3D(out_channels=cout)
    with jax.default_matmul_precision("highest"):
        out = flax_mod.apply(
            {"params": params["res"]}, jnp.asarray(x), jnp.asarray(temb)
        )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_spatial_transformer_write_parity():
    """ReferenceNet writer: banks captured == reference's norm1 output."""
    c, heads, ctx_dim = 64, 4, 24
    t_mod = _rand_init(oracle.Transformer3DModel(c, heads, ctx_dim))
    params, _, unused = apply_rules(
        _wrap("attn", t_mod).state_dict(), _attention_block_rules("attn", "attn")
    )
    assert not unused, unused

    rs = np.random.RandomState(1)
    x = rs.randn(2, 1, 4, 4, c).astype(np.float32)
    ctx = rs.randn(2, 3, ctx_dim).astype(np.float32)

    with torch.no_grad():
        ref, caps = t_mod(_nchw5(x), torch.from_numpy(ctx), mode="write")

    flax_mod = SpatialTransformer(channels=c, heads=heads,
                                  cross_attention_dim=ctx_dim)
    with jax.default_matmul_precision("highest"):
        out, banks = flax_mod.apply(
            {"params": params["attn"]}, jnp.asarray(x),
            context=jnp.asarray(ctx), capture_bank=True,
        )
    np.testing.assert_allclose(np.asarray(out), _to_bfhwc(ref), atol=2e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(banks[0]), caps[0].numpy(), atol=2e-4, rtol=1e-3
    )


def test_spatial_transformer_read_cfg_parity():
    """Denoising reader under CFG: bank concat + uncond-half self-only."""
    c, heads, ctx_dim, f = 64, 4, 24, 2
    t_mod = _rand_init(oracle.Transformer3DModel(c, heads, ctx_dim), seed=2)
    params, _, unused = apply_rules(
        _wrap("attn", t_mod).state_dict(), _attention_block_rules("attn", "attn")
    )
    assert not unused, unused

    rs = np.random.RandomState(2)
    b = 4  # CFG layout: rows [uncond uncond cond cond]
    x = rs.randn(b, f, 4, 4, c).astype(np.float32)
    ctx = rs.randn(b, 3, ctx_dim).astype(np.float32)
    bank = rs.randn(b, 16, c).astype(np.float32)

    with torch.no_grad():
        ref, _ = t_mod(
            _nchw5(x), torch.from_numpy(ctx), mode="read",
            banks=[torch.from_numpy(bank)], do_classifier_free_guidance=True,
        )

    flax_mod = SpatialTransformer(channels=c, heads=heads,
                                  cross_attention_dim=ctx_dim)
    drop_ref = jnp.asarray([True, True, False, False])
    with jax.default_matmul_precision("highest"):
        out_traced, _ = flax_mod.apply(
            {"params": params["attn"]}, jnp.asarray(x),
            context=jnp.asarray(ctx), ref_bank=jnp.asarray(bank),
            drop_ref=drop_ref, drop_mode="traced",
        )
        out_static, _ = flax_mod.apply(
            {"params": params["attn"]}, jnp.asarray(x),
            context=jnp.asarray(ctx), ref_bank=jnp.asarray(bank),
            drop_ref=drop_ref, drop_mode="first_half",
        )
    np.testing.assert_allclose(np.asarray(out_traced), _to_bfhwc(ref),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out_static), _to_bfhwc(ref),
                               atol=2e-4, rtol=1e-3)


def test_motion_module_parity():
    c, heads, f = 64, 4, 4
    t_mod = _rand_init(oracle.VanillaTemporalModule(c, heads=heads), seed=3)
    params, _, unused = apply_rules(
        _wrap("mm", t_mod).state_dict(), _motion_rules("mm", "mm")
    )
    assert not unused, unused

    rs = np.random.RandomState(3)
    x = rs.randn(2, f, 4, 4, c).astype(np.float32)
    with torch.no_grad():
        ref = _to_bfhwc(t_mod(_nchw5(x)))

    flax_mod = MotionModule(channels=c, heads=heads)
    with jax.default_matmul_precision("highest"):
        out = flax_mod.apply({"params": params["mm"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_pose_guider_stem_pyramid_parity():
    nc = 32
    t_mod = _rand_init(oracle.PoseGuider(noise_latent_channels=nc), seed=4)
    # randomize BN running stats so eval-mode normalisation is non-trivial
    g = torch.Generator().manual_seed(40)
    for m in t_mod.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                                 generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5
                )
    variables, unused = convert_pose_guider(t_mod.state_dict())
    assert not unused, unused

    rs = np.random.RandomState(4)
    x = rs.randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = [r.numpy().transpose(0, 2, 3, 1) for r in
               t_mod(torch.from_numpy(x))]

    flax_mod = PoseGuider(noise_latent_channels=nc, use_ca=False)
    x5 = x.transpose(0, 2, 3, 1)[:, None]  # (b, f=1, h, w, 3)
    with jax.default_matmul_precision("highest"):
        fea = flax_mod.apply(variables, jnp.asarray(x5), train=False)
    assert len(fea) == len(ref)
    for i, (a, r) in enumerate(zip(fea, ref)):
        np.testing.assert_allclose(
            np.asarray(a)[:, 0], r, atol=3e-4, rtol=1e-3,
            err_msg=f"pose guider feature {i}",
        )


def test_pose_guider_transformer_parity():
    """The per-scale self-attention block (ref-pose input is dead)."""
    from aniportrait_tpu.models.pose_guider import PoseGuiderTransformer
    from aniportrait_tpu.weights.convert import pose_guider_rules

    nc = 32
    t_mod = _rand_init(oracle.PoseGuiderTransformer2D(nc, heads=4, dim_head=8),
                       seed=5)
    params, _, unused = apply_rules(
        _wrap("cross_attn1", t_mod).state_dict(), pose_guider_rules()
    )
    assert not unused, unused

    rs = np.random.RandomState(5)
    x = rs.randn(2, 8, 8, nc).astype(np.float32)
    with torch.no_grad():
        ref = t_mod(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).numpy().transpose(0, 2, 3, 1)

    flax_mod = PoseGuiderTransformer(channels=nc, heads=4, dim_head=8)
    with jax.default_matmul_precision("highest"):
        out = flax_mod.apply({"params": params["cross_attn_1"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_ddim_step_parity():
    """Our scheduler's step vs the diffusers DDIM formula (v-pred, zero-SNR,
    trailing spacing, eta=0) at several timesteps."""
    sched = DDIMScheduler(
        beta_start=0.00085, beta_end=0.012, beta_schedule="linear",
        clip_sample=False, steps_offset=1, prediction_type="v_prediction",
        rescale_betas_zero_snr=True, timestep_spacing="trailing",
    )
    alphas = oracle.ddim_alphas(
        beta_schedule="linear", rescale_betas_zero_snr=True
    )
    np.testing.assert_allclose(
        np.asarray(sched.alphas_cumprod), alphas, atol=1e-6
    )

    ts = sched.timesteps(25)
    rs = np.random.RandomState(6)
    sample = rs.randn(1, 4, 8, 8).astype(np.float32)
    model_out = rs.randn(1, 4, 8, 8).astype(np.float32)
    for i in (0, 10, 24):
        t = int(ts[i])
        prev_t = int(ts[i + 1]) if i + 1 < len(ts) else t - 1000 // 25
        ref = oracle.ddim_step(
            model_out.astype(np.float64), t, prev_t,
            sample.astype(np.float64), alphas,
            prediction_type="v_prediction",
        )
        got = sched.step(
            jnp.asarray(model_out), t, jnp.asarray(sample),
            num_inference_steps=25,
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float64), ref, atol=1e-4, rtol=1e-4,
            err_msg=f"step at t={t}",
        )
