"""Probe: bf16 GEMM -- XLA precision flag effect + pallas comparison.

The round-2 gemm sweep's bf16 XLA baseline inherited precision=HIGHEST
from the f32 config (gemm_sweep.py:54,62).  If XLA upconverts bf16 operands
under HIGHEST, the committed 'pallas wins bf16 512-2048' routing was
measured against a handicapped baseline -- and worse, routing model GEMMs
to pallas_call inserts fusion barriers in compiled training steps.  This
probe measures, per shape: XLA/DEFAULT, XLA/HIGHEST, tuned pallas.

Shapes: the square sweep buckets plus the actual GPT-2 block GEMMs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from lightgrad_tpu.ops.runtime import on_tpu
from lightgrad_tpu.ops.matmul import _matmul_impl
from benchmarks.bench_util import time_median

on_tpu()

SHAPES = [
    (512, 512, 512),
    (1024, 1024, 1024),
    (2048, 2048, 2048),
    (4096, 768, 2304),    # GPT-2 qkv projection
    (4096, 768, 3072),    # GPT-2 mlp up
    (4096, 3072, 768),    # GPT-2 mlp down
    (4096, 768, 50304),   # GPT-2 lm head
]


def main():
    rng = np.random.default_rng(0)
    for m, k, n in SHAPES:
        a = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32)).astype(jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32)).astype(jnp.bfloat16)
        flops = 2 * m * k * n

        f_def = jax.jit(lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.DEFAULT))
        f_hi = jax.jit(lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST))
        f_pl = jax.jit(lambda a, b: _matmul_impl(a, b, "pallas"))

        out = [f"{m}x{k}x{n}:"]
        for name, f in (("xla/def", f_def), ("xla/hi", f_hi), ("pallas", f_pl)):
            dt, _ = time_median(lambda: f(a, b), iters=20, repeats=5)
            out.append(f"{name} {dt*1e3:7.3f}ms {flops/dt/1e12:6.1f}TF/s")
        print("  ".join(out), flush=True)


if __name__ == "__main__":
    main()
