import time, functools, math
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from aniportrait_tpu.utils.jax_setup import setup
setup()
import aniportrait_tpu.ops.pallas_attention as pa

K = 10
def med(fn, n=3):
    float(jnp.sum(fn().astype(jnp.float32)))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(jnp.sum(fn().astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))

rtt = med(jax.jit(lambda: jnp.zeros((8,128), jnp.float32)))
print(f"null rtt: {rtt*1e3:.1f} ms")
rs = np.random.RandomState(0)

def make_kernel(mode):
    def kern(scale, block_kv, skv, n_kv, heads, d,
             q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref):
        ki = pl.program_id(2)
        @pl.when(ki == 0)
        def _():
            m_ref[:] = jnp.full_like(m_ref, -1e30)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)
        q = q_ref[0]; k = k_ref[0]; v = v_ref[0]
        for h in range(heads):
            sl = slice(h*d, (h+1)*d)
            logits = jax.lax.dot_general(q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32) * scale
            if mode == "full":
                m_prev = m_ref[:, h:h+1]; l_prev = l_ref[:, h:h+1]
                m_cur = jnp.max(logits, axis=1, keepdims=True)
                m_new = jnp.maximum(m_prev, m_cur)
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.exp(logits - m_new)
                l_ref[:, h:h+1] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
                m_ref[:, h:h+1] = m_new
                acc_ref[:, sl] = acc_ref[:, sl] * alpha + jax.lax.dot_general(
                    p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            elif mode == "noexp":  # wrong math, timing only: no max/exp/sum
                p = logits * 0.001
                acc_ref[:, sl] = acc_ref[:, sl] + jax.lax.dot_general(
                    p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            elif mode == "nomax":  # exp but no running max (fixed offset)
                p = jnp.exp(logits - 10.0)
                l_ref[:, h:h+1] = l_ref[:, h:h+1] + jnp.sum(p, axis=1, keepdims=True)
                acc_ref[:, sl] = acc_ref[:, sl] + jax.lax.dot_general(
                    p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        @pl.when(ki == n_kv - 1)
        def _():
            o_ref[0] = acc_ref[:].astype(o_ref.dtype)
    return kern

def run(mode, b, sq, skv, c, heads, bq, bkv):
    d = c // heads
    scale = 1.0/math.sqrt(d)
    n_q, n_kv = sq//bq, skv//bkv
    q = jnp.asarray(rs.randn(b, sq, c), jnp.bfloat16)
    k = jnp.asarray(rs.randn(b, skv, c), jnp.bfloat16)
    v = jnp.asarray(rs.randn(b, skv, c), jnp.bfloat16)
    kern = functools.partial(make_kernel(mode), scale, bkv, skv, n_kv, heads, d)
    def call(qx):
        return pl.pallas_call(
            kern, grid=(b, n_q, n_kv),
            in_specs=[pl.BlockSpec((1, bq, c), lambda r, qi, ki: (r, qi, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, bkv, c), lambda r, qi, ki: (r, ki, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, bkv, c), lambda r, qi, ki: (r, ki, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, bq, c), lambda r, qi, ki: (r, qi, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, sq, c), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((bq, c), jnp.float32),
                            pltpu.VMEM((bq, 128), jnp.float32),
                            pltpu.VMEM((bq, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(qx, k, v)
    @jax.jit
    def g(q):
        def body(qc, _):
            return call(qc), ()
        out, _ = jax.lax.scan(body, q, None, length=K)
        return out[:, :1, :1]
    t = (med(lambda: g(q)) - rtt) / K
    flops = 2*2*b*heads*sq*skv*d
    print(f"{mode:6s} b{b} {sq}/{skv} c{c} bq{bq} bkv{bkv}: {t*1e3:7.2f} ms {flops/t/1e12:5.1f} TF/s")

for mode in ("full", "nomax", "noexp"):
    run(mode, 16, 4096, 8192, 320, 8, 512, 1024)

print("--- block shape sweep (full math) ---")
for bq, bkv in ((256, 2048), (128, 2048), (256, 4096), (128, 4096), (512, 2048), (256, 1024)):
    try:
        run("full", 16, 4096, 8192, 320, 8, bq, bkv)
    except Exception as e:
        print(f"full bq{bq} bkv{bkv}: FAIL {type(e).__name__}: {str(e)[:90]}")
