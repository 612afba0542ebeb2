#!/usr/bin/env python
"""Benchmark: pose2vid denoising throughput on the attached TPU chip.

Config (matches BASELINE.md config #2 scaled to the reference defaults):
  512x512, 16-frame clip, 25 DDIM steps, CFG 3.5, bf16, random weights
  (weights don't affect wall-clock; shapes/dtypes match the real model).

Prints ONE JSON line:
  {"metric": "frames_per_sec_512px_25step", "value": ..., "unit": "frames/s",
   "vs_baseline": ...}

vs_baseline: the reference publishes no numbers (BASELINE.md); the baseline
denominator is a cost-model estimate of the PyTorch reference on A100 fp16
for the same config: 25 steps x 2 (CFG) x 16 frames x ~0.7 TFLOP/frame UNet
+ VAE decode, at ~40% MFU => ~16 s => ~1.0 frames/s.  vs_baseline = fps / 1.0.
"""

import json
import sys
import time

import numpy as np


def main():
    if "--quality" in sys.argv:
        # quality gate mode: bench.py --quality OURS REF [quality_gate flags]
        from scripts.quality_gate import main as quality_main

        return quality_main(sys.argv[sys.argv.index("--quality") + 1 :])

    import jax
    import jax.numpy as jnp

    from aniportrait_tpu.utils.jax_setup import setup

    setup()

    from aniportrait_tpu.factory import build_model_defs, init_random_params
    from aniportrait_tpu.pipelines.pose2vid import Pose2VideoPipeline

    size = "full"
    steps = 25
    frames = 16
    res = 512
    metric = "frames_per_sec_512px_25step"
    if "--tiny" in sys.argv:
        size, steps, frames, res = "tiny", 2, 4, 64
        metric = "frames_per_sec_tiny_smoke"

    defs = build_model_defs(size=size, use_motion_module=True, dtype=jnp.bfloat16)
    modules = init_random_params(defs)
    # bf16 params: halves HBM and feeds the MXU directly
    for attr in ("vae_params", "clip_params", "reference_params", "denoising_params"):
        setattr(
            modules,
            attr,
            jax.tree.map(lambda x: x.astype(jnp.bfloat16), getattr(modules, attr)),
        )
    modules.pose_guider_variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), modules.pose_guider_variables
    )

    pipe = Pose2VideoPipeline(modules, dtype=jnp.bfloat16, window_batch=1)

    rs = np.random.RandomState(0)
    ref = rs.randint(0, 255, (res, res, 3), np.uint8)
    poses = [rs.randint(0, 255, (res, res, 3), np.uint8) for _ in range(frames)]
    kw = dict(
        width=res,
        height=res,
        video_length=frames,
        num_inference_steps=steps,
        guidance_scale=3.5,
        seed=0,
        windowed=True,
        decode_chunk=4,
    )

    # warmup/compile
    pipe(ref, poses, None, **kw)

    pipe.timer.totals.clear()
    pipe.timer.counts.clear()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = pipe(ref, poses, None, **kw)
        out.sum()  # force host sync
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    fps = frames / dt
    print(f"phase breakdown (3 runs): {pipe.timer.report()}", file=sys.stderr)

    baseline_fps = 1.0  # cost-modeled A100 fp16 PyTorch reference (see docstring)
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
