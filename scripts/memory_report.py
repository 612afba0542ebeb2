"""HBM accounting via AOT compile (VERDICT r4 item 3).

Publishes what the projections were missing: does the driver config, the
fused long-clip buckets (L=48/120/300), and the stage-1/2 train steps FIT
in a 16 GB v5e chip — from ``jit(...).lower(...).compile().
memory_analysis()``, which reports argument/output/temp allocation sizes
without any runtime memory API (the axon backend exposes none).

Zero weights are materialised: model parameters enter as
``ShapeDtypeStruct`` trees (``factory.init_shape_params``), so the script
costs one XLA compile per bucket (cached in ``.jax_cache`` — buckets the
driver bench already compiled are free) and no HBM.

Run (TPU backend):
    PYTHONPATH=/root/repo:/root/.axon_site python -m scripts.memory_report
Writes ``docs/memory_r5.json`` and prints a table for BASELINE.md.

Reference role: the reference never accounts memory (no equivalent); its
stage-2 needs gradient checkpointing to fit 16-frame clips on a consumer
GPU (``configs/train/stage2.yaml:11``) — remat plays that role here.
"""

from __future__ import annotations

import argparse
import json
import os

GIB = 1 << 30


def _setup():
    try:
        from aniportrait_tpu.utils.jax_setup import setup

        setup()
    except Exception:
        pass


def inference_buckets(buckets, size="full"):
    import jax.numpy as jnp

    from aniportrait_tpu.factory import build_model_defs, init_shape_params
    from aniportrait_tpu.pipelines.pose2vid import Pose2VideoPipeline

    defs = build_model_defs(size=size, use_motion_module=True, dtype=jnp.bfloat16)
    modules = init_shape_params(defs)

    rows = []
    for cfg in buckets:
        pipe = Pose2VideoPipeline(
            modules, dtype=jnp.bfloat16, window_batch=cfg.get("window_batch", 1),
            window_fusion=cfg.get("fused", False),
        )
        try:
            rep = pipe.memory_report(
                cfg["res"], cfg["res"], cfg["frames"], cfg["steps"],
                guidance_scale=3.5, windowed=cfg.get("windowed", True),
            )
        except Exception as e:  # an OOM at compile IS a result: record it
            msg = str(e)
            oom = "RESOURCE_EXHAUSTED" in msg or "memory" in msg.lower()
            rep = {"config": cfg, "error": msg.splitlines()[0][:300],
                   "fits": False if oom else None}
            print(f"{cfg['name']:>28}: COMPILE FAILED "
                  f"({'OOM' if oom else 'error'}): {rep['error'][:120]}",
                  flush=True)
            rep["name"] = cfg["name"]
            rows.append(rep)
            continue
        rep["name"] = cfg["name"]
        rep["fits"] = rep["peak_bound_gib"] < 16.0
        rows.append(rep)
        print(
            f"{cfg['name']:>28}: args {rep['argument_gib']:.2f} GiB, "
            f"temps {rep['temp_gib']:.2f} GiB, out {rep['output_gib']:.2f} "
            f"GiB -> peak bound {rep['peak_bound_gib']:.2f} GiB",
            flush=True,
        )
    return rows


def train_buckets(configs):
    """Stage-1/2 full-size train steps at the given batch sizes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aniportrait_tpu.factory import build_model_defs, init_shape_params
    from aniportrait_tpu.train.train_step import (
        TrainState,
        cast_frozen_to_bf16,
        make_optimizer,
        make_train_step,
    )

    rows = []
    for cfg in configs:
        stage, batch, frames, res = (
            cfg["stage"], cfg["batch"], cfg["frames"], cfg["res"]
        )
        defs = build_model_defs(
            size="full", use_motion_module=(stage == 2), dtype=jnp.bfloat16,
            gradient_checkpointing=True,
        )
        modules = init_shape_params(defs)
        params = {
            "reference": modules.reference_params,
            "denoising": modules.denoising_params,
            "pose_guider": modules.pose_guider_variables["params"],
        }
        params = cast_frozen_to_bf16(params, stage=stage)
        tx = make_optimizer(
            params, stage=stage, adam_8bit=cfg.get("adam_8bit", False)
        )
        step_fn = make_train_step(defs, tx, defs["scheduler"], stage=stage)
        opt_state = jax.eval_shape(tx.init, params)
        state = TrainState(
            params, modules.pose_guider_variables["batch_stats"], opt_state,
            jax.ShapeDtypeStruct((), np.int32),
        )
        frozen = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(tuple(x.shape), jnp.bfloat16),
            (modules.vae_params, modules.clip_params),
        )
        img = defs["clip"].image_size if hasattr(defs["clip"], "image_size") else 224
        f32 = jnp.float32
        batch_s = {
            "pixel_values": jax.ShapeDtypeStruct((batch, frames, res, res, 3), f32),
            "pixel_values_pose": jax.ShapeDtypeStruct((batch, frames, res, res, 3), f32),
            "pixel_values_ref_img": jax.ShapeDtypeStruct((batch, res, res, 3), f32),
            "clip_ref_image": jax.ShapeDtypeStruct((batch, img, img, 3), f32),
        }
        # match the live PRNG impl's key shape (rbg = (4,) uint32)
        rng_s = jax.ShapeDtypeStruct(jax.random.PRNGKey(0).shape, jnp.uint32)
        try:
            compiled = step_fn.lower(state, frozen, batch_s, rng_s).compile()
            ma = compiled.memory_analysis()
        except Exception as e:  # a compile OOM IS a result
            msg = str(e)
            oom = "RESOURCE_EXHAUSTED" in msg or "memory" in msg.lower()
            rep = {"name": cfg["name"], "config": cfg,
                   "error": msg.splitlines()[0][:300],
                   "fits": False if oom else None}
            rows.append(rep)
            print(f"{cfg['name']:>28}: COMPILE FAILED "
                  f"({'OOM' if oom else 'error'}): {rep['error'][:120]}",
                  flush=True)
            continue
        rep = {
            "name": cfg["name"],
            "config": cfg,
            "argument_gib": ma.argument_size_in_bytes / GIB,
            "output_gib": ma.output_size_in_bytes / GIB,
            "temp_gib": ma.temp_size_in_bytes / GIB,
            "alias_gib": ma.alias_size_in_bytes / GIB,
            # donated state aliases its output; aliased bytes are not new
            "peak_bound_gib": (
                ma.argument_size_in_bytes + ma.output_size_in_bytes
                + ma.temp_size_in_bytes - ma.alias_size_in_bytes
            ) / GIB,
        }
        rep["fits"] = rep["peak_bound_gib"] < 16.0
        rows.append(rep)
        print(
            f"{cfg['name']:>28}: args {rep['argument_gib']:.2f} GiB, "
            f"temps {rep['temp_gib']:.2f} GiB, out {rep['output_gib']:.2f} "
            f"GiB, aliased {rep['alias_gib']:.2f} -> peak bound "
            f"{rep['peak_bound_gib']:.2f} GiB",
            flush=True,
        )
    return rows


INFER_BUCKETS = [
    dict(name="pose2vid512 16f exact", res=512, frames=16, steps=25),
    dict(name="vid2vid512 24f exact", res=512, frames=24, steps=25,
         window_batch=2),
    dict(name="audio2vid512 48f fused", res=512, frames=48, steps=25,
         fused=True),
    dict(name="long 48f exact", res=512, frames=48, steps=25,
         window_batch=2),
    dict(name="long 120f exact", res=512, frames=120, steps=25,
         window_batch=2),
    dict(name="long 300f exact", res=512, frames=300, steps=25,
         window_batch=2),
    dict(name="long 120f fused", res=512, frames=120, steps=25, fused=True),
    dict(name="long 300f fused", res=512, frames=300, steps=25, fused=True),
]

TRAIN_BUCKETS = [
    dict(name="stage2 b1 16f 512", stage=2, batch=1, frames=16, res=512),
    dict(name="stage2 b2 16f 512", stage=2, batch=2, frames=16, res=512),
    dict(name="stage1 b2 1f 512", stage=1, batch=2, frames=1, res=512),
    dict(name="stage1 b4 1f 512", stage=1, batch=4, frames=1, res=512),
    dict(name="stage1 b2 1f 512 adam8bit", stage=1, batch=2, frames=1,
         res=512, adam_8bit=True),
    dict(name="stage1 b4 1f 512 adam8bit", stage=1, batch=4, frames=1,
         res=512, adam_8bit=True),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/memory_r5.json")
    p.add_argument("--only", default="", help="substring filter on bucket names")
    p.add_argument("--exclude", default="",
                   help="comma-separated substrings of bucket names to skip "
                        "(e.g. known-OOM buckets whose compile attempt costs "
                        "20 min through the remote service)")
    p.add_argument("--skip-train", action="store_true")
    p.add_argument("--skip-infer", action="store_true")
    args = p.parse_args()
    _setup()
    import jax

    excl = [e for e in args.exclude.split(",") if e]
    sel = lambda bs: [
        b for b in bs
        if args.only in b["name"] and not any(e in b["name"] for e in excl)
    ]
    out = {"backend": jax.default_backend(),
           "device": str(jax.devices()[0]),
           "note": ("compile-time HBM accounting: peak_bound = arguments + "
                    "outputs + temps - aliased; the actual runtime peak is "
                    "<= this bound (buffer reuse) and >= temps")}
    if not args.skip_infer:
        out["inference"] = inference_buckets(sel(INFER_BUCKETS))
    if not args.skip_train:
        out["train"] = train_buckets(sel(TRAIN_BUCKETS))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    prev = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f)
    for k in ("inference", "train"):
        if k in out and k in prev:
            seen = {r["name"] for r in out[k]}
            out[k] = out[k] + [r for r in prev[k] if r["name"] not in seen]
        elif k not in out and k in prev:
            out[k] = prev[k]
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
