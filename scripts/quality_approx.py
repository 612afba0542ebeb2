"""Quality-gate the APPROXIMATE fast paths against the exact path
(VERDICT r2 items 3 and 6).

Two opt-in approximations trade exactness for speed:

  * ``--encoder-cache k`` — Faster-Diffusion-style encoder feature reuse:
    the UNet's down/mid features are recomputed only every k-th DDIM step
    (reference role: none — this is beyond the reference).
  * ``--window-fusion`` — long-clip mode where the spatial UNet runs once
    over the whole clip per step and only the motion modules window
    internally (reference role: the sequential window loop,
    pipeline_pose2vid_long.py:487-548, is the exact baseline).

This script runs each approximation and its exact twin at the SAME seed /
SAME random weights / SAME config on the real chip and reports per-frame
PSNR + SSIM of the approximate output vs the exact output.  With random
weights the outputs are not *images* in a perceptual sense, so the numbers
measure numerical path divergence (how far the approximation drifts from
the exact sampler through 25 steps of feedback), which is the gateable
quantity available before real checkpoints arrive: an approximation that
tracks the exact path on random weights (high PSNR) is structurally sound;
one that diverges would diverge on real weights too.

Run:  python -m scripts.quality_approx [--res 512] [--steps 25]
Emits one JSON line per variant, and a markdown table for BASELINE.md.
"""

import json
import sys
import time

import numpy as np


def _video(pipe, staged, frames, res, steps):
    kw = dict(
        width=res, height=res, video_length=frames,
        num_inference_steps=steps, guidance_scale=3.5, seed=0,
        windowed=True, decode_chunk=8,
    )
    t0 = time.perf_counter()
    out = pipe(staged, None, None, **kw)  # float [0,1] host
    dt = time.perf_counter() - t0
    return (out * 255.0).round().astype(np.uint8), dt


def _compare(name, approx, exact, frames, compile_dt, warm_dt):
    from aniportrait_tpu.utils.quality import psnr, ssim

    ps = [psnr(approx[i], exact[i]) for i in range(frames)]
    ss = [ssim(approx[i], exact[i]) for i in range(frames)]
    row = {
        "variant": name,
        "psnr_mean": round(float(np.mean(ps)), 2),
        "psnr_min": round(float(np.min(ps)), 2),
        "ssim_mean": round(float(np.mean(ss)), 4),
        "ssim_min": round(float(np.min(ss)), 4),
        "warm_s": round(warm_dt, 2),
    }
    print(json.dumps(row), flush=True)
    return row


def main(res=512, steps=25):
    import jax.numpy as jnp

    from bench import _bf16_modules
    from aniportrait_tpu.factory import build_model_defs
    from aniportrait_tpu.pipelines.pose2vid import Pose2VideoPipeline

    defs = build_model_defs(size="full", use_motion_module=True,
                            dtype=jnp.bfloat16)
    modules = _bf16_modules(defs)
    rs = np.random.RandomState(0)
    ref = rs.randint(0, 255, (res, res, 3), np.uint8)

    rows = []

    # --- encoder cache on the driver config (16 frames, single window) ----
    frames = 16
    poses = [rs.randint(0, 255, (res, res, 3), np.uint8)
             for _ in range(frames)]

    def run_cfg(k=1, fusion=False, n_frames=frames, pose_imgs=None):
        pipe = Pose2VideoPipeline(
            modules, dtype=jnp.bfloat16, window_batch=1,
            encoder_cache_interval=k, window_fusion=fusion,
        )
        staged = pipe.stage_inputs(ref, pose_imgs or poses, res, res,
                                   device=True)
        t0 = time.perf_counter()
        video, _ = _video(pipe, staged, n_frames, res, steps)  # compile
        compile_dt = time.perf_counter() - t0
        video, warm_dt = _video(pipe, staged, n_frames, res, steps)
        return video, compile_dt, warm_dt

    print(f"exact path ({frames}f {res}px {steps} steps)...", flush=True)
    exact, cdt, wdt = run_cfg(k=1)
    print(f"  compile+run {cdt:.1f}s, warm {wdt:.2f}s", flush=True)
    for k in (2, 3):
        print(f"encoder cache k={k}...", flush=True)
        approx, cdt, wdt = run_cfg(k=k)
        rows.append(_compare(f"encoder-cache k={k}", approx, exact,
                             frames, cdt, wdt))

    # --- window fusion on the vid2vid24 config (24 frames, 2 windows) -----
    frames24 = 24
    poses24 = [rs.randint(0, 255, (res, res, 3), np.uint8)
               for _ in range(frames24)]
    print(f"exact windowed ({frames24}f)...", flush=True)
    exact24, cdt, wdt = run_cfg(n_frames=frames24, pose_imgs=poses24)
    print(f"  compile+run {cdt:.1f}s, warm {wdt:.2f}s", flush=True)
    print("window fusion...", flush=True)
    fused, cdt, wdt = run_cfg(fusion=True, n_frames=frames24,
                              pose_imgs=poses24)
    rows.append(_compare("window-fusion L=24", fused, exact24,
                         frames24, cdt, wdt))

    print("\nBASELINE.md table:")
    print("| Variant | PSNR mean/min (dB) | SSIM mean/min | notes |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['variant']} | {r['psnr_mean']} / {r['psnr_min']} | "
              f"{r['ssim_mean']} / {r['ssim_min']} | warm {r['warm_s']}s |")


if __name__ == "__main__":
    res = int(sys.argv[sys.argv.index("--res") + 1]) if "--res" in sys.argv else 512
    steps = int(sys.argv[sys.argv.index("--steps") + 1]) if "--steps" in sys.argv else 25
    main(res, steps)
