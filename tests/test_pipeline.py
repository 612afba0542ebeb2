"""End-to-end pipeline smoke test at tiny scale (windowed + CFG paths)."""

import numpy as np
import pytest

from aniportrait_tpu.factory import build_model_defs, init_random_params
from aniportrait_tpu.pipelines.pose2vid import Pose2ImagePipeline, Pose2VideoPipeline


@pytest.fixture(scope="module")
def pipeline():
    defs = build_model_defs(size="tiny", use_motion_module=True)
    modules = init_random_params(defs)
    return Pose2VideoPipeline(
        modules, context_frames=4, context_overlap=2, window_batch=2
    )


def test_pose2vid_windowed(pipeline):
    rs = np.random.RandomState(0)
    ref = rs.randint(0, 255, (70, 70, 3), np.uint8)
    poses = [rs.randint(0, 255, (70, 70, 3), np.uint8) for _ in range(6)]
    video = pipeline(
        ref, poses, None,
        width=64, height=64, video_length=6,
        num_inference_steps=2, guidance_scale=3.5, seed=1,
        decode_chunk=2,
    )
    assert video.shape == (6, 64, 64, 3)
    assert np.isfinite(video).all()
    assert video.min() >= 0.0 and video.max() <= 1.0


def test_pose2img(pipeline):
    p2i = Pose2ImagePipeline(
        pipeline.m, context_frames=4, context_overlap=2, window_batch=2
    )
    rs = np.random.RandomState(1)
    ref = rs.randint(0, 255, (70, 70, 3), np.uint8)
    pose = rs.randint(0, 255, (70, 70, 3), np.uint8)
    img = p2i(ref, pose, width=64, height=64, num_inference_steps=2, seed=2)
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()


def test_deterministic_seed(pipeline):
    rs = np.random.RandomState(2)
    ref = rs.randint(0, 255, (70, 70, 3), np.uint8)
    poses = [rs.randint(0, 255, (70, 70, 3), np.uint8) for _ in range(3)]
    kw = dict(width=64, height=64, video_length=3, num_inference_steps=2, seed=7)
    v1 = pipeline(ref, poses, None, **kw)
    v2 = pipeline(ref, poses, None, **kw)
    np.testing.assert_array_equal(v1, v2)


def test_latent_interpolation():
    import jax.numpy as jnp
    import torch

    from aniportrait_tpu.pipelines.interpolation import interpolate_latents, slerp

    rs = np.random.RandomState(0)
    lat = rs.randn(1, 4, 8, 8, 4).astype(np.float32)
    out = interpolate_latents(jnp.asarray(lat), 3, "slerp")
    assert out.shape == (1, 10, 8, 8, 4)
    # endpoints preserved
    np.testing.assert_allclose(np.asarray(out[:, 0]), lat[:, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[:, -1]), lat[:, -1], atol=1e-6)

    # slerp parity vs reference formula (src/pipelines/utils.py:19-29)
    v0 = torch.from_numpy(rs.randn(8, 8, 4).astype(np.float32))
    v1 = torch.from_numpy(rs.randn(8, 8, 4).astype(np.float32))
    t = 0.3
    u0, u1 = v0 / v0.norm(), v1 / v1.norm()
    dot = (u0 * u1).sum()
    omega = dot.acos()
    ref = (((1.0 - t) * omega).sin() * v0 + (t * omega).sin() * v1) / omega.sin()
    out = slerp(jnp.asarray(v0.numpy()), jnp.asarray(v1.numpy()), t)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


def test_staged_inputs_match_host_inputs(pipeline):
    """stage_inputs + return_device path produces the same video as the
    plain host-array path (bench uses it to exclude tunnel transfers)."""
    rs = np.random.RandomState(7)
    ref = rs.randint(0, 255, (64, 64, 3), np.uint8)
    poses = [rs.randint(0, 255, (64, 64, 3), np.uint8) for _ in range(4)]
    kw = dict(width=64, height=64, video_length=4, num_inference_steps=1,
              guidance_scale=3.5, seed=2, decode_chunk=2)
    v1 = pipeline(ref, poses, None, **kw)
    staged = pipeline.stage_inputs(ref, poses, 64, 64, device=True)
    v2 = pipeline(staged, None, None, return_device=True, **kw)
    v2 = np.asarray(v2).astype(np.float32) / 255.0
    np.testing.assert_array_equal(v1, v2)


def test_encoder_cache_interval_one_is_exact(pipeline):
    """encoder_cache_interval=1 (refresh every step) must equal the default
    sampler bit-for-bit; interval=2 is the documented approximation and
    must still produce finite, close output."""
    from aniportrait_tpu.factory import build_model_defs, init_random_params
    from aniportrait_tpu.pipelines.pose2vid import Pose2VideoPipeline

    rs = np.random.RandomState(9)
    ref = rs.randint(0, 255, (64, 64, 3), np.uint8)
    poses = [rs.randint(0, 255, (64, 64, 3), np.uint8) for _ in range(6)]
    kw = dict(width=64, height=64, video_length=6, num_inference_steps=2,
              guidance_scale=3.5, seed=4, decode_chunk=2)
    v0 = pipeline(ref, poses, None, **kw)

    cached2 = Pose2VideoPipeline(
        pipeline.m, context_frames=4, context_overlap=2, window_batch=2,
        encoder_cache_interval=2,
    )
    # with a single step, the cache refreshes at step 0 and is never
    # reused: the cached sampler must match the default one exactly
    kw1 = dict(kw, num_inference_steps=1)
    np.testing.assert_allclose(
        cached2(ref, poses, None, **kw1),
        pipeline(ref, poses, None, **kw1),
        atol=1.5 / 255,  # uint8 staging: reduction-order pixel rounding
    )

    v2 = cached2(ref, poses, None, **kw)
    assert np.isfinite(v2).all()
    # approximation, not identity — but same ballpark
    assert np.abs(v2 - v0).mean() < 0.2


def test_window_fusion_nonoverlap_matches_exact(pipeline):
    """Window fusion with NON-overlapping windows is the same computation
    as the exact windowed path (each frame lives in exactly one window in
    both), so outputs must match to numerical tolerance."""
    from aniportrait_tpu.pipelines.pose2vid import Pose2VideoPipeline

    exact = Pose2VideoPipeline(
        pipeline.m, context_frames=4, context_overlap=0, window_batch=2
    )
    fused = Pose2VideoPipeline(
        pipeline.m, context_frames=4, context_overlap=0, window_batch=2,
        window_fusion=True, fusion_motion="context",
    )
    rs = np.random.RandomState(3)
    ref = rs.randint(0, 255, (70, 70, 3), np.uint8)
    poses = [rs.randint(0, 255, (70, 70, 3), np.uint8) for _ in range(8)]
    kw = dict(width=64, height=64, video_length=8, num_inference_steps=2,
              guidance_scale=3.5, seed=4, decode_chunk=2)
    v_exact = exact(ref, poses, None, **kw)
    v_fused = fused(ref, poses, None, **kw)
    np.testing.assert_allclose(v_fused, v_exact, atol=2 / 255.0)


def test_window_fusion_auto_whole_clip_matches_fixed(pipeline):
    """fusion_motion='auto' with L <= motion PE max runs whole-clip temporal
    attention — exactly the fixed-length (windowed=False) pipeline, i.e.
    the reference's pipeline_pose2vid.py semantics.  Outputs must match."""
    from aniportrait_tpu.pipelines.pose2vid import Pose2VideoPipeline

    fused = Pose2VideoPipeline(
        pipeline.m, context_frames=4, context_overlap=2, window_batch=2,
        window_fusion=True,  # fusion_motion='auto' default
    )
    rs = np.random.RandomState(6)
    ref = rs.randint(0, 255, (70, 70, 3), np.uint8)
    poses = [rs.randint(0, 255, (70, 70, 3), np.uint8) for _ in range(6)]
    kw = dict(width=64, height=64, video_length=6, num_inference_steps=2,
              guidance_scale=3.5, seed=4, decode_chunk=2)
    v_auto = fused(ref, poses, None, **kw)
    v_fixed = pipeline(ref, poses, None, windowed=False, **kw)
    np.testing.assert_allclose(v_auto, v_fixed, atol=2 / 255.0)


def test_window_fusion_auto_wide_windows(pipeline):
    """fusion_motion='auto' with L > motion PE max re-windows the motion
    modules with context.wide_motion_windows — finite, in-range,
    deterministic output (the approximation is quality-gated on chip)."""
    from aniportrait_tpu.pipelines.pose2vid import Pose2VideoPipeline

    fused = Pose2VideoPipeline(
        pipeline.m, context_frames=4, context_overlap=2, window_batch=2,
        window_fusion=True,
    )
    # pin a small PE limit so L=10 exceeds it without a 33-frame test clip
    object.__setattr__(fused.m.denoising_unet, "motion_pe_max_len", 8)
    try:
        rs = np.random.RandomState(7)
        ref = rs.randint(0, 255, (70, 70, 3), np.uint8)
        poses = [rs.randint(0, 255, (70, 70, 3), np.uint8) for _ in range(10)]
        kw = dict(width=64, height=64, video_length=10, num_inference_steps=2,
                  guidance_scale=3.5, seed=4, decode_chunk=2)
        v1 = fused(ref, poses, None, **kw)
        assert v1.shape == (10, 64, 64, 3)
        assert np.isfinite(v1).all()
        assert v1.min() >= 0.0 and v1.max() <= 1.0
    finally:
        object.__setattr__(fused.m.denoising_unet, "motion_pe_max_len", 32)


def test_window_fusion_overlap_sane(pipeline):
    """Overlapping windows: fusion is the documented approximation — output
    must be finite, in range, and deterministic."""
    from aniportrait_tpu.pipelines.pose2vid import Pose2VideoPipeline

    fused = Pose2VideoPipeline(
        pipeline.m, context_frames=4, context_overlap=2, window_batch=2,
        window_fusion=True, fusion_motion="context",
    )
    rs = np.random.RandomState(4)
    ref = rs.randint(0, 255, (70, 70, 3), np.uint8)
    poses = [rs.randint(0, 255, (70, 70, 3), np.uint8) for _ in range(6)]
    kw = dict(width=64, height=64, video_length=6, num_inference_steps=2,
              guidance_scale=3.5, seed=5, decode_chunk=2)
    v1 = fused(ref, poses, None, **kw)
    assert v1.shape == (6, 64, 64, 3)
    assert np.isfinite(v1).all()
    assert v1.min() >= 0.0 and v1.max() <= 1.0
    v2 = fused(ref, poses, None, **kw)
    np.testing.assert_array_equal(v1, v2)


def test_context_rotate_step0_matches_exact(pipeline):
    """context_rotate=True at ONE denoise step uses the step-0 table — the
    same table as the static default — so output must match bit-for-bit.
    With 2 steps the rotated table differs at step 1: output stays finite
    and in range (rotation is an opt-in quality experiment, not parity)."""
    from aniportrait_tpu.pipelines.pose2vid import Pose2VideoPipeline

    rot = Pose2VideoPipeline(
        pipeline.m, context_frames=4, context_overlap=2, window_batch=2,
        context_rotate=True,
    )
    rs = np.random.RandomState(11)
    ref = rs.randint(0, 255, (70, 70, 3), np.uint8)
    poses = [rs.randint(0, 255, (70, 70, 3), np.uint8) for _ in range(6)]
    kw = dict(width=64, height=64, video_length=6, num_inference_steps=1,
              guidance_scale=3.5, seed=4, decode_chunk=2)
    np.testing.assert_allclose(
        rot(ref, poses, None, **kw),
        pipeline(ref, poses, None, **kw),
        atol=1.5 / 255,  # uint8 staging: reduction-order pixel rounding
    )
    v2 = rot(ref, poses, None, **dict(kw, num_inference_steps=2))
    assert np.isfinite(v2).all()
    assert v2.min() >= 0.0 and v2.max() <= 1.0


def test_run_cases_overlapped_matches_serial(pipeline):
    """run_cases (IO-overlapped multi-case driver) yields exactly what
    serial __call__ does, in order, including per-case kw overrides."""
    rs = np.random.RandomState(3)
    kw = dict(num_inference_steps=2, guidance_scale=3.5, seed=1,
              decode_chunk=2)
    cases = []
    for i, n in enumerate((6, 4)):
        cases.append(dict(
            ref_image=rs.randint(0, 255, (70, 70, 3), np.uint8),
            pose_images=[rs.randint(0, 255, (70, 70, 3), np.uint8)
                         for _ in range(n)],
            key=f"case{i}",
            kw=dict(video_length=n),
        ))
    got = list(pipeline.run_cases(cases, 64, 64, **kw))
    assert [k for k, _ in got] == ["case0", "case1"]
    for (key, video), c in zip(got, cases):
        serial = pipeline(
            c["ref_image"], c["pose_images"], None, 64, 64,
            video_length=c["kw"]["video_length"], **kw,
        )
        np.testing.assert_allclose(video, serial, atol=1e-6)
