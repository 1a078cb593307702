"""Isolate where the decode megakernel's time goes on the real chip.

Times, per lax.scan iteration of 64:
  mega      -- the production decode_stack kernel (GPT-2-small shapes)
  dma1      -- same grid (L, S) + same block specs, body = one f32 row add
               (pure pipeline/DMA cost at 144 grid steps)
  dma3      -- (1, 3, d, d) slab blocks, grid (L, S/3) = 48 steps
  dma3_nc   -- dma3 without the cache input (isolates cache-block refetch)
Slab roofline at 819 GB/s: 142 MB -> 0.173 ms.
"""

import sys, time, functools
import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, S, d, H, hd, W = 12, 12, 768, 12, 64, 256
cdt = jnp.bfloat16


def timed(name, fn, *args):
    jfn = jax.jit(fn)
    # tunnel rule: sync via one-element readback only (block_until_ready
    # returns early through axon)
    float(np.asarray(jfn(*args)).ravel()[0])
    vals = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = jfn(*args)
        float(np.asarray(out).ravel()[0])
        vals.append((time.perf_counter() - t0) / 64)
    ms = float(np.median(vals)) * 1e3
    print(f"{name:10s} {ms:7.4f} ms/iter  ({142.6/ms:6.0f} GB/s slab-equiv)",
          file=sys.stderr)
    return ms


def scan64(body, *carry_and_args):
    def run(*a):
        def f(c, _):
            return body(*c, *a[len(c):]), None
        c, _ = jax.lax.scan(f, a[:1], None, length=64)
        return c
    return run


def main():
    key = jax.random.PRNGKey(0)
    slabs = jax.random.normal(key, (L, S, d, d), cdt) * 0.02
    vecs = jax.random.normal(key, (L, 13, d), cdt) * 0.02
    cache = jnp.zeros((L, 2, H, W, hd), cdt)
    x = jax.random.normal(key, (1, d), cdt)

    # --- production megakernel ------------------------------------------
    from lightgrad_tpu.ops.decode_stack import decode_stack

    def mega_once(x, slabs, vecs, cache):
        y, kv = decode_stack(x, cache, jnp.int32(5), slabs, vecs, eps=1e-5)
        return y

    def mega64(x, slabs, vecs, cache):
        def f(c, _):
            return mega_once(c, slabs, vecs, cache), None
        c, _ = jax.lax.scan(f, x, None, length=64)
        return c

    timed("mega", mega64, x, slabs, vecs, cache)

    # --- DMA-only variants ------------------------------------------------
    def dma_kernel(slab_ref, cache_ref, o_ref, acc):
        ls = pl.program_id(0)
        @pl.when(ls == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)
        acc[...] += slab_ref[0, 0, :1].astype(jnp.float32)
        acc[...] += cache_ref[0, 0, 0, :1, :].reshape(1, hd).astype(
            jnp.float32).sum() * 0
        o_ref[...] = acc[...].astype(o_ref.dtype)

    def make_dma(block_s, with_cache=True):
        grid = (L * (S // block_s),)
        per_l = S // block_s

        def idx(i):
            return (i // per_l, (i % per_l), 0, 0)

        in_specs = [pl.BlockSpec((1, block_s, d, d), idx,
                                 memory_space=pltpu.VMEM)]
        if with_cache:
            in_specs.append(pl.BlockSpec(
                (1, 2, H, W, hd), lambda i: (i // per_l, 0, 0, 0, 0),
                memory_space=pltpu.VMEM))

        def kern(slab_ref, *rest):
            if with_cache:
                cache_ref, o_ref, acc = rest
            else:
                o_ref, acc = rest
            i = pl.program_id(0)
            @pl.when(i == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)
            acc[...] += slab_ref[0, 0, :1].astype(jnp.float32)
            if with_cache:
                acc[...] += (cache_ref[0, 0, 0, :1, :].astype(jnp.float32)
                             .sum() * 0)
            o_ref[...] = acc[...].astype(o_ref.dtype)

        def once(x, slabs, cache):
            a = [slabs] + ([cache] if with_cache else [])
            return pl.pallas_call(
                kern, grid=grid, in_specs=in_specs,
                out_specs=pl.BlockSpec((1, d), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, d), cdt),
                scratch_shapes=[pltpu.VMEM((1, d), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(*a) + x * 0

        def run(x, slabs, cache):
            def f(c, _):
                return once(c, slabs, cache), None
            c, _ = jax.lax.scan(f, x, None, length=64)
            return c

        return run

    timed("dma1", make_dma(1), x, slabs, cache)
    timed("dma3", make_dma(3), x, slabs, cache)
    timed("dma3_nc", make_dma(3, with_cache=False), x, slabs, cache)
    timed("dma6", make_dma(6), x, slabs, cache)


if __name__ == "__main__":
    main()
