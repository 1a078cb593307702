"""Probe 2: is the megakernel's DMA underutilizing HBM because it issues
ONE block fetch at a time?  Variants split the slab array into N parallel
inputs whose blocks are prefetched concurrently (N DMA streams in flight).
Yardsticks: raw XLA device copy and an XLA GEMV chain over the same bytes.
"""

import sys, time
import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, S, d = 12, 12, 768
cdt = jnp.bfloat16
TOT_MB = L * S * d * d * 2 / 1e6


def timed(name, fn, *args, iters=64):
    jfn = jax.jit(fn)
    float(np.asarray(jfn(*args)).ravel()[0])
    vals = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = jfn(*args)
        float(np.asarray(out).ravel()[0])
        vals.append((time.perf_counter() - t0) / iters)
    ms = float(np.median(vals)) * 1e3
    print(f"{name:10s} {ms:7.4f} ms/iter  ({TOT_MB/ms:6.0f} GB/s)",
          file=sys.stderr)
    return ms


def make_split(n_split):
    """Slabs split into n arrays; each grid step fetches one block from
    EACH (concurrent DMA streams), computes a row-add on all."""
    per = S // n_split
    grid = (L * per,)

    def idx(i):
        return (i // per, i % per, 0, 0)

    in_specs = [pl.BlockSpec((1, 1, d, d), idx, memory_space=pltpu.VMEM)
                for _ in range(n_split)]

    def kern(*refs):
        slab_refs, o_ref, acc = refs[:n_split], refs[n_split], refs[n_split + 1]
        i = pl.program_id(0)
        @pl.when(i == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)
        for r in slab_refs:
            acc[...] += r[0, 0, :1].astype(jnp.float32)
        o_ref[...] = acc[...].astype(o_ref.dtype)

    def once(x, parts):
        return pl.pallas_call(
            kern, grid=grid, in_specs=in_specs,
            out_specs=pl.BlockSpec((1, d), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, d), cdt),
            scratch_shapes=[pltpu.VMEM((1, d), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(*parts) + x * 0

    def run(x, *parts):
        def f(c, _):
            return once(c, parts), None
        c, _ = jax.lax.scan(f, x, None, length=64)
        return c

    return run


def main():
    key = jax.random.PRNGKey(0)
    slabs = jax.random.normal(key, (L, S, d, d), cdt) * 0.02
    x = jax.random.normal(key, (1, d), cdt)

    # yardstick 1: XLA GEMV chain through the same bytes
    def gemv64(x, slabs):
        flat = slabs.reshape(L * S, d, d)
        def f(c, _):
            y = c
            for i in range(L * S):
                y = jax.lax.dot_general(
                    y, flat[i], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(cdt) * 0.01
            return y, None
        c, _ = jax.lax.scan(f, x, None, length=64)
        return c

    timed("xla_gemv", gemv64, x, slabs)

    for n in (1, 2, 4):
        parts = [jnp.asarray(slabs[:, i::n]) for i in range(n)]
        timed(f"split{n}", make_split(n), x, *parts)


if __name__ == "__main__":
    main()
