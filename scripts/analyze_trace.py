"""Per-op roofline analysis of a jax.profiler trace (offline; no chip).

Groups TPU device events by exact HLO op name, sums durations, and uses the
event metadata (`bytes_accessed`, `model_flops`, `long_name`) to classify
each op against the v5e roofline: achieved HBM GB/s for bandwidth-bound ops
and achieved TFLOP/s for compute-bound ones.  This is how we find the ops
worth attacking — a "fusion" category total says elementwise work is
expensive; this says WHICH fusion, at WHAT shape, and how far from the
~819 GB/s / ~197 bf16-TFLOP/s v5e ceilings it runs.

Usage:
    python -m scripts.analyze_trace <trace_dir_or_xplane_parent> [--top N]
       [--cat CATEGORY_SUBSTR]
"""

import collections
import glob
import gzip
import json
import re
import sys

HBM_GBPS = 819.0   # v5e HBM bandwidth ceiling
MXU_TFLOPS = 197.0  # v5e bf16 peak


def load_events(trace_dir):
    path = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not path:
        path = sorted(glob.glob(f"{trace_dir}/*.trace.json.gz"))
    with gzip.open(path[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    return [
        e
        for e in events
        if e.get("ph") == "X"
        and "dur" in e
        and pids.get(e.get("pid"), "") == "/device:TPU:0"
    ]


def analyze(trace_dir, top=40, cat_filter=None):
    events = load_events(trace_dir)
    by_name = collections.defaultdict(
        lambda: {"dur": 0.0, "n": 0, "bytes": 0, "flops": 0, "long": "",
                 "cat": ""}
    )
    total = 0.0
    for e in events:
        name = e.get("name", "?")
        if name.startswith("jit_") or name == "while":
            continue
        a = e.get("args", {})
        r = by_name[name]
        r["dur"] += e["dur"]
        r["n"] += 1
        r["bytes"] += int(a.get("bytes_accessed", 0) or 0)
        r["flops"] += int(a.get("model_flops", 0) or 0)
        if not r["long"]:
            r["long"] = a.get("long_name", "")[:400]
            r["cat"] = a.get("hlo_category", "")
        total += e["dur"]

    rows = sorted(by_name.items(), key=lambda kv: -kv[1]["dur"])
    if cat_filter:
        rows = [r for r in rows if cat_filter in r[1]["cat"]]
    print(f"device op total: {total/1e6:.2f} s   (ops grouped by exact name)")
    print(f"{'ms':>9} {'x':>6} {'GB/s':>6} {'TF/s':>6}  name / shape")
    for name, r in rows[:top]:
        dur_s = r["dur"] / 1e6
        gbps = (r["bytes"] / 1e9) / dur_s if dur_s else 0.0
        tfps = (r["flops"] / 1e12) / dur_s if dur_s else 0.0
        # first output shape from the long name
        m = re.search(r"= \(?([a-z0-9]+\[[^\]]*\])", r["long"])
        shape = m.group(1) if m else ""
        # bound-ness tag
        tag = ""
        if r["bytes"]:
            bw_frac = gbps / HBM_GBPS
            mxu_frac = tfps / MXU_TFLOPS
            tag = f"bw={bw_frac:4.0%} mxu={mxu_frac:4.0%}"
        print(
            f"{r['dur']/1e3:9.2f} {r['n']:>6} {gbps:6.0f} {tfps:6.1f}  "
            f"{name:<28} {r['cat']:<22} {shape}  {tag}"
        )


def main():
    argv = sys.argv[1:]
    trace_dir = argv[0] if argv and not argv[0].startswith("--") else "/tmp/anip_trace"
    top = int(argv[argv.index("--top") + 1]) if "--top" in argv else 40
    cat = argv[argv.index("--cat") + 1] if "--cat" in argv else None
    analyze(trace_dir, top, cat)


if __name__ == "__main__":
    main()
