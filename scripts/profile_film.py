"""Trace one warm FiLM midpoint call and print per-source-line device time."""

import numpy as np


def main():
    import jax

    from aniportrait_tpu.utils.jax_setup import setup

    setup()

    from aniportrait_tpu.utils.frame_interpolation import (
        init_frame_interpolation_model,
    )
    from scripts.profile_pipeline import aggregate

    film = init_frame_interpolation_model(weights_path=None, random_init=True)
    rs = np.random.RandomState(0)
    a = rs.rand(4, 512, 512, 3).astype(np.float32)
    b = rs.rand(4, 512, 512, 3).astype(np.float32)
    film(a, b)  # compile+warm

    jax.profiler.start_trace("/tmp/film_trace")
    film(a, b)
    jax.profiler.stop_trace()
    aggregate("/tmp/film_trace")

    # also by source line
    import collections
    import glob
    import gzip
    import json

    path = sorted(glob.glob("/tmp/film_trace/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    pids = {}
    for e in data["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    src = collections.defaultdict(float)
    cnt = collections.Counter()
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and "dur" in e and pids.get(e.get("pid")) == "/device:TPU:0":
            if e.get("name", "").startswith("jit_"):
                continue
            s = (e.get("args") or {}).get("source", "?")
            src[s] += e["dur"]
            cnt[s] += 1
    print("--- by source line ---")
    for s, d in sorted(src.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{d/1e3:9.2f} ms x{cnt[s]:<5} {s}")


if __name__ == "__main__":
    main()
