"""Ad-hoc chip A/B of the token-layout flash kernels at the driver config's
hot shapes, plus the d=40-padding experiment VERDICT r2 asked for: time the
same (rows, seq) problem at d=128 (no contraction padding) vs d=40 — if they
match, wall-clock is MXU-pass/VPU-bound and no head-packing scheme that
conserves padded passes can help.

Measured (1x v5e, 2026-08, ms/call at the driver shapes):

    shape                      runmax   noshift   bounded  unshifted
    cond 4096q/8192kv d40       19.09     20.74     15.72      15.21
    uncond 4096q/4096kv d40     11.33     12.20      9.70       9.63
    res2 1024q/3072kv d80        7.15      4.62      4.48       4.26
    padding-exp same-seq d128   58.17     26.68     26.99      26.52

The UNSHIFTED exp2 kernel is fastest at every hot shape (no per-logit
shift subtract at all, guarded by a post-hoc over/underflow check that
reroutes to the running-max kernel), and it also deletes the bounded
kernel's Cauchy-Schwarz precompute.  The running max loses to both fixed
shifts' pipeline overlap; the no-shift MXU-l variant loses because its
extra N=1 matmul costs a full d=40 PV pass.  The d=128
experiment answers VERDICT r2 item 1: the same (rows, seq) problem at
d=128 runs 81.5 useful TF/s vs 33 at d=40 — wall-clock tracks per-logit
VPU work, not padded MXU passes, so head-packing schemes that conserve
the logit count cannot help; only fewer logits or cheaper per-logit VPU
ops can.

Run: python -m scripts.bench_tok_kernel
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from aniportrait_tpu.ops.pallas_attention import (
    flash_attention_tokens,
    flash_attention_tokens_bounded,
    flash_attention_tokens_noshift,
    flash_attention_tokens_unshifted,
)

KERNELS = {
    "runmax": flash_attention_tokens,
    "bounded": flash_attention_tokens_bounded,
    "noshift": flash_attention_tokens_noshift,
    "unshifted": flash_attention_tokens_unshifted,
}


def median(fn, n=5):
    """Scalar-sum fetch per run: block_until_ready does not flush this
    chip's tunnel queue (see bench.py)."""
    fn()  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    rs = np.random.RandomState(0)

    REPS = 8  # amortise the ~30 ms tunnel dispatch+fetch round trip

    def make(kernel_name):
        kernel = KERNELS[kernel_name]

        @functools.partial(jax.jit, static_argnames=("heads",))
        def run(q, k, v, heads):
            s = jnp.float32(0)
            for i in range(REPS):  # distinct q per rep defeats CSE
                s += jnp.sum(
                    kernel(q * (1.0 + 0.01 * i), k, v, heads=heads).astype(
                        jnp.float32
                    )
                )
            return s

        return run

    runners = {name: make(name) for name in KERNELS}

    for name, (b, sq, skv, heads, d) in {
        "cond 4096q/8192kv d40": (16, 4096, 8192, 8, 40),
        "uncond 4096q/4096kv d40": (16, 4096, 4096, 8, 40),
        "res2 1024q/3072kv d80": (16, 1024, 3072, 8, 80),
        "padding-exp 4096q/8192kv d128": (16, 4096, 8192, 8, 128),
    }.items():
        c = heads * d
        q = jax.device_put(jnp.asarray(rs.randn(b, sq, c), jnp.bfloat16))
        k = jax.device_put(jnp.asarray(rs.randn(b, skv, c) * 0.1, jnp.bfloat16))
        v = jax.device_put(jnp.asarray(rs.randn(b, skv, c), jnp.bfloat16))

        times = {
            kname: median(lambda r=run: float(r(q, k, v, heads))) / REPS
            for kname, run in runners.items()
        }
        flops = 2 * 2 * b * heads * sq * skv * d
        best = min(times, key=times.get)
        cols = " | ".join(
            f"{kname} {t*1e3:.2f} ms" for kname, t in times.items()
        )
        print(
            f"{name}: {cols} | best {best} "
            f"({flops/times[best]/1e12:.1f} useful TF/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
