"""In-program GEMM throughput: chained matmuls inside ONE jit program.

Per-op timings through the tunneled chip bottom out at a ~1.7-2.4ms
dispatch floor (benchmarks/bf16_gemm_probe.py): any GEMM under ~100 GFLOP
measures the tunnel, not the kernel.  But inside a compiled training step
the GEMMs run back-to-back in one program -- what matters there is pure
kernel throughput plus the fusion-barrier cost of a pallas_call.  This
probe chains N dependent matmuls inside one jit and reports per-GEMM time
for the XLA emitter vs the Pallas kernel at model shapes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from lightgrad_tpu.ops.runtime import on_tpu
from lightgrad_tpu.ops.matmul import _matmul_impl
from benchmarks.bench_util import time_median

on_tpu()

# (M, K) x (K, K) chained: output feeds the next GEMM so XLA cannot
# parallelize across links; K stays square to keep shapes closed
SHAPES = [(512, 512), (1024, 1024), (4096, 768), (4096, 3072), (2048, 2048)]
CHAIN = 32


def main():
    rng = np.random.default_rng(0)
    for m, k in SHAPES:
        a = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32) * 0.05).astype(jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(k, k)).astype(np.float32) * 0.05).astype(jnp.bfloat16)
        flops = 2 * m * k * k

        def chain_xla(a, b):
            y = a
            for _ in range(CHAIN):
                y = jnp.matmul(y, b, precision=jax.lax.Precision.DEFAULT)
            return y

        def chain_pallas(a, b):
            y = a
            for _ in range(CHAIN):
                y = _matmul_impl(y, b, "pallas")
            return y

        out = [f"{m}x{k}x{k} chain{CHAIN}:"]
        for name, f in (("xla", jax.jit(chain_xla)),
                        ("pallas", jax.jit(chain_pallas))):
            dt, _ = time_median(lambda: f(a, b), iters=5, repeats=5)
            per = dt / CHAIN
            out.append(f"{name} {per*1e6:8.1f}us/gemm {flops/per/1e12:6.1f}TF/s")
        print("  ".join(out), flush=True)


if __name__ == "__main__":
    main()
