"""Flash fwd at d=64: production kernel vs a 2-heads-per-grid-step variant
(VERDICT r3 #5, the untried "head-packing" lever).

The d=64 score GEMM fills only half the MXU's 128-deep contraction; packing
two heads along d would SUM their scores (wrong math), so true contraction
packing is impossible.  What CAN help is processing two heads per grid
step -- one (1, 2, bq, d) q block and (1, 2, bk, d) k/v blocks, the two
heads' score/softmax/context chains unrolled back-to-back so Mosaic can
overlap head A's VPU softmax with head B's MXU dots and the pipeline
fetches half as many (larger) blocks.  This probe times the production
forward (ops/attention.py) against that packed variant, in-program chained,
same math, same FLOPs.  If the packed variant wins >5% it graduates into
ops/attention.py; either way the number settles whether the d=64 gap is
structural or schedulable.

Run: timeout 1200 python benchmarks/flash_pair_probe.py
"""

import functools
import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lightgrad_tpu.ops import attention as A
from lightgrad_tpu.ops.runtime import interpret

_NEG = -1e30


def _pair_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                 *, scale, nk, bq, bk):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for t in (0, 1):  # two heads per grid step, chains interleaved
        s = jax.lax.dot_general(
            q_ref[0, t], k_ref[0, t], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale       # (bq, bk)
        m_prev = m_ref[t]
        m_new = jnp.maximum(m_prev, jnp.max(s, -1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[t] = l_ref[t] * alpha + jnp.sum(p, -1, keepdims=True)
        acc_ref[t] = acc_ref[t] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, t], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[t] = m_new

    @pl.when(kb == nk - 1)
    def _():
        o_ref[0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)


def pair_flash_fwd(q, k, v, scale, bq=512, bk=512):
    """q/k/v (P, 2, s, d): P head-pairs."""
    P, _, s, d = q.shape
    nq, nk = s // bq, s // bk
    row = lambda h, i, j: (h, 0, i, 0)
    col = lambda h, i, j: (h, 0, j, 0)
    return pl.pallas_call(
        functools.partial(_pair_kernel, scale=scale, nk=nk, bq=bq, bk=bk),
        grid=(P, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 2, bq, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, bk, d), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, bk, d), col, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, bq, d), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, 2, s, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bq, 1), jnp.float32),
            pltpu.VMEM((2, bq, 1), jnp.float32),
            pltpu.VMEM((2, bq, d), jnp.float32),
        ],
        interpret=interpret(),
    )(q, k, v)


def time_median(run, repeats=5):
    run()
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        out = run()
        np.asarray(out)[0]
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def time_differenced(make_chain, arg, c_short=4, c_long=60, repeats=9):
    """Marginal per-call seconds by INTERLEAVED two-length differencing.

    The tunnel's per-dispatch cost swings 25-770 ms call to call in degraded
    windows -- larger than a whole region, so differencing region MEDIANS
    (or even minima) taken minutes apart goes negative when the floor
    drifts between the two measurement windows (both observed on
    2026-08-20).  Instead each repeat times the short and the long chain
    BACK TO BACK -- the adjacent dispatches see ~the same tunnel state, so
    their difference isolates compute -- and the median over per-pair
    differences rejects the pairs a swing did split."""
    f_s, f_l = make_chain(c_short), make_chain(c_long)

    def once(f):
        t0 = time.time()
        np.asarray(f(arg))[0]
        return time.time() - t0

    once(f_s), once(f_l)  # compile both before any timed pair
    diffs = []
    for _ in range(repeats):
        s = once(f_s)
        l = once(f_l)
        diffs.append(l - s)
    diffs.sort()
    return diffs[len(diffs) // 2] / (c_long - c_short)


def main(bh=96, s=2048, d=64, chain=4):
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(
        rng.normal(size=(bh, s, d)) * 0.1, jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    scale = 1.0 / np.sqrt(d)
    flops = 4 * bh * s * s * d  # fwd only

    # correctness first (tiny shape, interpret off-TPU is fine)
    out_ref, _ = A._flash_fwd(q[:4], k[:4], v[:4], scale, False)
    out_pair = pair_flash_fwd(q[:4].reshape(2, 2, s, d),
                              k[:4].reshape(2, 2, s, d),
                              v[:4].reshape(2, 2, s, d), scale)
    np.testing.assert_allclose(
        np.asarray(out_pair.reshape(4, s, d), np.float32),
        np.asarray(out_ref, np.float32), atol=2e-2, rtol=2e-2)
    print("parity ok", flush=True)

    def make_prod(n):
        @jax.jit
        def f(q):
            x = q
            for _ in range(n):
                x, _ = A._flash_fwd(x, k, v, scale, False)
            return x
        return f

    qp, kp, vp = (a.reshape(bh // 2, 2, s, d) for a in (q, k, v))

    def make_pair(n):
        @jax.jit
        def f(qp):
            x = qp
            for _ in range(n):
                x = pair_flash_fwd(x, kp, vp, scale)
            return x
        return f

    for name, make, arg in (("production", make_prod, q),
                            ("head-pair", make_pair, qp)):
        dt = time_differenced(make, arg)
        print(f"{name:11s} fwd {bh}x{s}x{d}: {dt*1e3:7.2f} ms  "
              f"{flops/dt/1e12:6.1f} TF/s  (mfu {flops/dt/197e12:.3f})",
              flush=True)


if __name__ == "__main__":
    main()
