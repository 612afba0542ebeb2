"""Quality-vs-speed gate for the opt-in approximations (VERDICT r2 item 3).

Measures what is measurable WITHOUT pretrained weights: the numerical
divergence each approximation introduces relative to the exact path, with
the full-size architecture, random weights, fixed seed — PSNR/SSIM between
the approximate and exact outputs of the SAME model.  This quantifies the
approximation error of the mechanism itself (the encoder-feature reuse /
the motion-window fusion), independent of perceptual content; re-run on
real weights on arrival day for the perceptual numbers
(docs/WEIGHTS_RUNBOOK.md step 3).

Gates measured:
  * encoder cache k=2 / k=3 vs exact (Faster-Diffusion-style reuse,
    pipelines/pose2vid.py) at the driver config (512x512, 16f, 25 steps);
  * window fusion vs the exact windowed path (motion-module-internal
    windowing, models/motion_module.py) at 512x512, 24f, 25 steps.

Usage:  python -m scripts.quality_speed_gate [--res 512] [--steps 25]
        [--out report.json]
Writes one markdown table to stdout (for BASELINE.md) + optional JSON.
"""

import argparse
import json
import sys
import time

import numpy as np


_MODULES = None


def _build(res, window_fusion=False, encoder_cache_interval=1,
           context_rotate=False, fusion_motion="auto"):
    import jax.numpy as jnp

    from aniportrait_tpu.factory import build_model_defs
    from aniportrait_tpu.pipelines.pose2vid import Pose2VideoPipeline
    from bench import _bf16_modules

    global _MODULES
    if _MODULES is None:
        defs = build_model_defs(
            size="full", use_motion_module=True, dtype=jnp.bfloat16
        )
        _MODULES = _bf16_modules(defs)
    return Pose2VideoPipeline(
        _MODULES, dtype=jnp.bfloat16, window_batch=1,
        encoder_cache_interval=encoder_cache_interval,
        window_fusion=window_fusion,
        fusion_motion=fusion_motion,
        context_rotate=context_rotate,
    )


def _metrics(a, b):
    from aniportrait_tpu.utils.quality import psnr, ssim

    a8 = (a * 255.0).round().astype(np.uint8).astype(np.float64)
    b8 = (b * 255.0).round().astype(np.uint8).astype(np.float64)
    ps = [psnr(x, y) for x, y in zip(a8, b8)]
    ss = [ssim(x, y) for x, y in zip(a8, b8)]
    return float(np.mean(ps)), float(np.mean(ss))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--win-frames", type=int, default=24)
    ap.add_argument("--long-frames", type=int, default=0,
                    help="also gate the wide-window fusion at this length "
                         "(e.g. 48, the audio2vid clip)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip-enc-cache", action="store_true")
    ap.add_argument("--skip-fusion", action="store_true")
    ap.add_argument(
        "--check", action="store_true",
        help="compare the fresh measurements against the stored gate table "
             "(docs/quality_gate*.json) and exit 1 if any approximation's "
             "divergence regressed beyond tolerance — a kernel change that "
             "silently hurts an approximate path should fail here, not ship",
    )
    args = ap.parse_args(argv)

    from aniportrait_tpu.utils.jax_setup import setup

    setup()

    rs = np.random.RandomState(0)
    res = args.res
    ref = rs.randint(0, 255, (res, res, 3), np.uint8)
    rows = []

    def timed(pipe, poses, frames):
        kw = dict(width=res, height=res, video_length=frames,
                  num_inference_steps=args.steps, guidance_scale=3.5,
                  seed=0, windowed=True, decode_chunk=8)
        staged = pipe.stage_inputs(ref, poses, res, res, device=True)
        out = pipe(staged, None, None, **kw)  # compile + result
        t0 = time.perf_counter()
        pipe(staged, None, None, return_device=True, **kw)
        dt = time.perf_counter() - t0
        return out, frames / dt

    if not args.skip_enc_cache:
        poses = [rs.randint(0, 255, (res, res, 3), np.uint8)
                 for _ in range(args.frames)]
        exact, fps_exact = timed(_build(res), poses, args.frames)
        rows.append(("pose2vid exact (k=1)", fps_exact, None, None))
        for k in (2, 3):
            out, fps = timed(
                _build(res, encoder_cache_interval=k), poses, args.frames
            )
            ps, ss = _metrics(out, exact)
            rows.append((f"encoder cache k={k}", fps, ps, ss))

    if not args.skip_fusion:
        poses = [rs.randint(0, 255, (res, res, 3), np.uint8)
                 for _ in range(args.win_frames)]
        # fixed-table exact twin: fusion cannot rotate its window table, so
        # the comparison isolates the fusion mechanism from table phase
        exact, fps_exact = timed(
            _build(res, context_rotate=False), poses, args.win_frames
        )
        rows.append((
            f"windowed exact ({args.win_frames}f)", fps_exact, None, None
        ))
        # two fusion variants (pipelines/pose2vid.py fusion_motion):
        #   'context' — motion modules keep the exact path's window table
        #   'auto'    — whole-clip temporal attention (L <= PE max 32; the
        #               reference's fixed-length pipeline semantics)
        out, fps = timed(
            _build(res, window_fusion=True, fusion_motion="context"),
            poses, args.win_frames,
        )
        ps, ss = _metrics(out, exact)
        rows.append(("window fusion (motion=context)", fps, ps, ss))
        out, fps = timed(_build(res, window_fusion=True), poses, args.win_frames)
        ps, ss = _metrics(out, exact)
        rows.append(("window fusion (auto: whole-clip)", fps, ps, ss))
        # context rotation (opt-in, NOT reference behavior — the reference
        # hardcodes step 0, pipeline_pose2vid_long.py:488,500): per-step
        # van-der-Corput window phase vs the step-0 exact table
        out, fps = timed(
            _build(res, context_rotate=True), poses, args.win_frames
        )
        ps, ss = _metrics(out, exact)
        rows.append(("context rotate (per-step tables)", fps, ps, ss))

    if args.long_frames:
        # the audio2vid-length clip: fused motion re-windows WIDE
        # (context.wide_motion_windows, e.g. 48f -> 2 windows of 26)
        poses = [rs.randint(0, 255, (res, res, 3), np.uint8)
                 for _ in range(args.long_frames)]
        exact, fps_exact = timed(
            _build(res, context_rotate=False), poses, args.long_frames
        )
        rows.append((
            f"windowed exact ({args.long_frames}f)", fps_exact, None, None
        ))
        out, fps = timed(
            _build(res, window_fusion=True), poses, args.long_frames
        )
        ps, ss = _metrics(out, exact)
        rows.append(("window fusion (auto: wide windows)", fps, ps, ss))

    print("| mode | frames/s | PSNR vs exact (dB) | SSIM vs exact |")
    print("|---|---|---|---|")
    report = []
    for name, fps, ps, ss in rows:
        ps_s = "—" if ps is None else f"{ps:.2f}"
        ss_s = "—" if ss is None else f"{ss:.4f}"
        print(f"| {name} | {fps:.3f} | {ps_s} | {ss_s} |")
        report.append({"mode": name, "fps": fps, "psnr": ps, "ssim": ss})
    print(
        "(random full-size weights, fixed seed — measures the approximation's"
        " numerical divergence, not perceptual quality on real weights)",
        file=sys.stderr,
    )
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    if args.check:
        from aniportrait_tpu.utils.quality_gate import check_regression

        problems = check_regression(report)
        if problems:
            print("\nQUALITY GATE REGRESSION:", file=sys.stderr)
            for p in problems:
                print(" -", p, file=sys.stderr)
            return 1
        print("gate check OK: no divergence regression vs stored table",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
