"""Capture a jax.profiler trace of one warm full-pipeline run and print the
aggregated per-op-category device time.  Usage:

    python -m scripts.profile_pipeline [--trace-dir /tmp/anip_trace]
"""

import collections
import glob
import gzip
import json
import re
import sys

import numpy as np


def aggregate(trace_dir):
    path = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    cat = collections.defaultdict(float)
    cnt = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            if pids.get(e.get("pid"), "") == "/device:TPU:0":
                name = e.get("name", "?")
                if name.startswith("jit_"):
                    continue
                base = re.sub(r"[.\d]+$", "", name)
                cat[base] += e["dur"]
                cnt[base] += 1
                total += e["dur"]
    print(f"device total (excl. jit envelopes): {total/1e6:.2f} s")
    for name, d in sorted(cat.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{d/1e3:9.2f} ms  x{cnt[name]:<5} {name}")


def main():
    trace_dir = "/tmp/anip_trace"
    if "--trace-dir" in sys.argv:
        trace_dir = sys.argv[sys.argv.index("--trace-dir") + 1]
    n_frames = (int(sys.argv[sys.argv.index("--frames") + 1])
                if "--frames" in sys.argv else 16)
    fusion = "--window-fusion" in sys.argv

    import jax
    import jax.numpy as jnp

    from aniportrait_tpu.utils.jax_setup import setup

    setup()

    from aniportrait_tpu.factory import build_model_defs
    from aniportrait_tpu.pipelines.pose2vid import Pose2VideoPipeline
    from bench import _bf16_modules

    defs = build_model_defs(size="full", use_motion_module=True, dtype=jnp.bfloat16)
    modules = _bf16_modules(defs)
    pipe = Pose2VideoPipeline(modules, dtype=jnp.bfloat16, window_batch=1,
                              window_fusion=fusion)
    rs = np.random.RandomState(0)
    res, frames = 512, n_frames
    ref = rs.randint(0, 255, (res, res, 3), np.uint8)
    poses = [rs.randint(0, 255, (res, res, 3), np.uint8) for _ in range(frames)]
    kw = dict(width=res, height=res, video_length=frames,
              num_inference_steps=25, guidance_scale=3.5, seed=0,
              windowed=True, decode_chunk=8)
    staged = pipe.stage_inputs(ref, poses, res, res, device=True)
    out = pipe(staged, None, None, return_device=True, **kw)  # compile
    float(jnp.sum(out.astype(jnp.float32)))

    jax.profiler.start_trace(trace_dir)
    out = pipe(staged, None, None, return_device=True, **kw)
    float(jnp.sum(out.astype(jnp.float32)))
    jax.profiler.stop_trace()
    aggregate(trace_dir)


if __name__ == "__main__":
    main()
