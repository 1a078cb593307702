"""Probe: embedding-table gradient as XLA scatter-add vs one-hot GEMM.

The GPT/BERT training step's wte/wpe backward is a scatter-add of (T, d)
rows into a (V, d) table.  TPU scatter is sequentialized when update
windows may collide; the MXU alternative builds the one-hot (V, T) matrix
implicitly inside a GEMM (iota == ids broadcast-compare, fused by XLA) and
pays 2*V*T*d FLOPs instead.  This probe measures both at GPT-2-small
shapes so ops/gather policy can route on data, not folklore.

Run on the real chip: python benchmarks/embed_grad_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from lightgrad_tpu.ops.runtime import on_tpu

on_tpu()  # enables the persistent compile cache (tunnel compiles are slow)


def _sync(r):
    """Real readback of ONE element: index on device, then transfer 4 bytes.
    (np.asarray(whole).ravel()[0] would drag the full buffer through the
    tunnel; block_until_ready does not actually wait through axon.)"""
    leaf = jax.tree_util.tree_leaves(r)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    _sync(r)
    vals = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        _sync(r)
        vals.append((time.perf_counter() - t0) / iters)
    return float(np.median(vals))


def main():
    V, T, D = 50304, 4096, 768
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, V, (T,)).astype(np.int32))
    for dtype in (jnp.float32, jnp.bfloat16):
        g = jnp.asarray(rng.normal(size=(T, D)).astype(np.float32)).astype(dtype)

        @jax.jit
        def scatter_grad(ids, g):
            return jnp.zeros((V, D), dtype).at[ids].add(g)

        @jax.jit
        def onehot_grad(ids, g):
            oh = (ids[:, None] == jax.lax.iota(jnp.int32, V)[None, :])
            return jnp.einsum("tv,td->vd", oh.astype(g.dtype), g,
                              preferred_element_type=jnp.float32).astype(dtype)

        @jax.jit
        def sort_segsum_grad(ids, g):
            # sort-by-id then segment-sum: the third strategy
            order = jnp.argsort(ids)
            return jax.ops.segment_sum(
                g[order], ids[order], num_segments=V).astype(dtype)

        name = jnp.dtype(dtype).name
        a = timeit(scatter_grad, ids, g)
        print(f"  {name} scatter {a*1e3:.3f}ms", flush=True)
        b = timeit(onehot_grad, ids, g)
        print(f"  {name} one-hot {b*1e3:.3f}ms", flush=True)
        c = timeit(sort_segsum_grad, ids, g)
        print(f"  {name} segsum {c*1e3:.3f}ms", flush=True)
        # correctness cross-check
        ga = np.asarray(scatter_grad(ids, g), np.float32)
        gb = np.asarray(onehot_grad(ids, g), np.float32)
        # TPU matmuls run bf16-ish passes at default precision; this check
        # guards indexing correctness, not accumulation rounding
        tol = 5e-2 if dtype == jnp.float32 else 2e-1
        np.testing.assert_allclose(ga, gb, rtol=tol, atol=tol)
        print(f"dtype={jnp.dtype(dtype).name}: scatter {a*1e3:.3f}ms | "
              f"one-hot GEMM {b*1e3:.3f}ms | sort+segsum {c*1e3:.3f}ms",
              flush=True)


if __name__ == "__main__":
    main()
