"""Decode GEMV floor probe: what does a bare chain of (1, K) @ (K, N)
matrix-vector products achieve on this chip?

The decode budget (decode_budget.py) showed the full step at ~258 GB/s
effective vs ~885 GB/s marginal on the MLP ablation -- this separates the
two candidate explanations (per-thunk launch overhead vs GEMV bandwidth
inefficiency) by timing pure GEMV chains with varying op counts, batch
rows, and weight layouts:

  unrolled   -- N distinct weights, unrolled python loop in one jit program
  scanned    -- same weights stacked (N, K, K), lax.scan with in-scan slice
  m8         -- activation padded to 8 rows (same weight traffic)
  int8       -- int8 weights dequantized into the dot

GB/s per variant tells the story: if unrolled ~= peak at depth 16 but falls
at depth 48, it's launch overhead; if all are ~300 GB/s, the GEMV itself is
the floor and only fewer/bigger reads help.

Run: timeout 1200 python benchmarks/gemv_chain_probe.py
"""

import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    K = 2048
    rng = np.random.default_rng(0)

    def report(name, dt, total_bytes, n_ops):
        print(f"{name:24s}: {dt*1e6:8.1f} us = {total_bytes/dt/1e9:6.1f} GB/s"
              f"  ({dt*1e6/n_ops:6.2f} us/op)", file=sys.stderr)

    def timeit(fn, *args, iters=30):
        out = fn(*args)
        float(np.asarray(out).ravel()[0])
        vals = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            float(np.asarray(out).ravel()[0])
            vals.append((time.perf_counter() - t0) / iters)
        return float(np.median(vals))

    for depth in (16, 48):
        Ws = jnp.asarray(rng.normal(0, 0.02, (depth, K, K)).astype(np.float32)
                         ).astype(jnp.bfloat16)
        x1 = jnp.asarray(rng.normal(0, 1, (1, K)).astype(np.float32)
                         ).astype(jnp.bfloat16)
        x8 = jnp.asarray(rng.normal(0, 1, (8, K)).astype(np.float32)
                         ).astype(jnp.bfloat16)
        wbytes = depth * K * K * 2

        Wlist = [Ws[i] for i in range(depth)]

        @jax.jit
        def unrolled(x, *Wl):
            for W in Wl:
                x = jnp.tanh(x @ W)
            return x

        dt = timeit(unrolled, x1, *Wlist)
        report(f"unrolled d={depth} m=1", dt, wbytes, depth)

        dt = timeit(unrolled, x8, *Wlist)
        report(f"unrolled d={depth} m=8", dt, wbytes, depth)

        @jax.jit
        def scanned(x, Ws):
            def body(h, W):
                return jnp.tanh(h @ W), ()

            h, _ = jax.lax.scan(body, x, Ws)
            return h

        dt = timeit(scanned, x1, Ws)
        report(f"scanned  d={depth} m=1", dt, wbytes, depth)

        # int8 weights, dequant fused into the dot read
        Wq = jnp.asarray(
            np.clip(rng.normal(0, 40, (depth, K, K)), -127, 127
                    ).astype(np.int8))
        sc = jnp.full((depth, K), 0.001, jnp.bfloat16)

        @jax.jit
        def unrolled_q(x, Wq, sc):
            for i in range(depth):
                x = jnp.tanh((x @ Wq[i].astype(jnp.bfloat16)) * sc[i])
            return x

        dt = timeit(unrolled_q, x1, Wq, sc)
        report(f"unrolled-int8 d={depth}", dt, wbytes // 2, depth)

    # tiny-op launch-floor probe: N chained elementwise ops on a tiny array
    for n_ops in (100, 400):
        v = jnp.ones((8, 128), jnp.float32)

        @jax.jit
        def tiny(v):
            for i in range(n_ops):
                # alternating non-fusable pattern (reduce then broadcast)
                v = v + jnp.sum(v) * 1e-9
            return v

        dt = timeit(tiny, v, iters=20)
        report(f"tiny-chain n={n_ops}", dt, 0.0 + 1, n_ops)


if __name__ == "__main__":
    main()
