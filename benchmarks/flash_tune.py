"""In-program flash-attention block-shape sweep (VERDICT r2 #5).

Chains N dependent flash fwd+bwd passes inside ONE jit program (the only
trustworthy ranking through the tunneled chip -- per-op timings under ~2ms
are dispatch floor) and reports achieved TF/s per (bq, bk) config at the
bench shape 96x2048x64 bf16, plus the head-stacked layout (48x2048x128:
2 heads fused so the score-GEMM contraction is 128 = full MXU rows).

Usage: python benchmarks/flash_tune.py [--causal]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from lightgrad_tpu.ops import attention as A
from lightgrad_tpu.ops.runtime import on_tpu
from benchmarks.bench_util import time_median

on_tpu()

CHAIN = 3  # big chains compile too slowly through the tunnel
CONFIGS = [(256, 512), (256, 1024), (512, 512), (512, 1024), (512, 2048),
           (1024, 1024)]
if os.environ.get("FLASH_TUNE_QUICK"):  # A/B runs: only the measured-best two
    CONFIGS = [(512, 512), (512, 2048)]


def bench_shape(bh, s, d, causal=False):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(bh, s, d)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(bh, s, d)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(bh, s, d)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    scale = 1.0 / np.sqrt(d)
    flops = 4 * bh * s * s * d * 3.5 * (0.5 if causal else 1.0)

    # chain fwd+bwd via jax.vjp through the custom-VJP attention (raw
    # pallas_call has no AD rule); output feeds next link so nothing overlaps
    def chain(q0):
        q = q0
        for _ in range(CHAIN):
            (out, lse), vjp = jax.vjp(
                lambda a, b, c: A._attn_res(a, b, c, scale, causal, "pallas"),
                q, k, v)
            dq, dk, dv = vjp((out, jnp.zeros_like(lse)))
            q = dq.astype(q0.dtype)
        return q

    results = {}
    for bq, bk in CONFIGS:
        if bq > s or bk > s:
            continue
        A.set_flash_blocks(bq, bk)
        try:
            f = jax.jit(chain)
            dt, _ = time_median(lambda: f(q), iters=4, repeats=5)
            per = dt / CHAIN
            tf = flops / per / 1e12
            results[(bq, bk)] = tf
            print(f"  ({bh}x{s}x{d}{' causal' if causal else ''}) "
                  f"bq={bq:4d} bk={bk:4d}: {per*1e3:7.2f}ms "
                  f"{tf:6.1f}TF/s (mfu {tf/197:.3f})", flush=True)
        except Exception as e:  # Mosaic rejections etc.
            print(f"  bq={bq} bk={bk}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
    A.set_flash_blocks(512, 512)  # restore the production default
    return results


def main():
    causal = "--causal" in sys.argv
    print(f"device: {jax.devices()[0]}")
    if "--per-pass" in sys.argv:
        # fwd blocks fixed at the sweep winner; vary each backward pass's
        # blocks independently (the dq pass streams k, the dkv pass streams
        # q -- their reuse patterns differ)
        global CONFIGS
        CONFIGS = [(512, 512)]
        # one pass varied at a time (16 combos won't fit the tunnel's
        # compile budget; the passes are independent kernels anyway)
        settings = [(None, None)]
        settings += [(blk, None) for blk in
                     [(256, 512), (512, 256), (1024, 512)]]
        settings += [(None, blk) for blk in
                     [(256, 512), (512, 256), (512, 1024)]]
        for dq_blk, dkv_blk in settings:
            A.set_flash_bwd_blocks(dq=dq_blk, dkv=dkv_blk)
            print(f"dq={dq_blk or 'fwd'} dkv={dkv_blk or 'fwd'}:", flush=True)
            for bh, s, d in ((96, 2048, 64), (48, 2048, 128)):
                bench_shape(bh, s, d, causal=causal)
        A.set_flash_bwd_blocks()
        return
    if "--skip-ab" in sys.argv:
        # causal block-skip in the two-pass backward: on vs off, in-session
        for skip in (False, True):
            A.set_flash_bwd_skip(skip)
            print(f"bwd causal skip = {skip}:")
            bench_shape(96, 2048, 64, causal=True)
            bench_shape(48, 2048, 128, causal=True)
        A.set_flash_bwd_skip(True)
        return
    if "--ab" in sys.argv:
        # same-session fused vs two-pass backward comparison (chip variance
        # is 2-3x across hours; only in-session rankings are trustworthy)
        for fused in (True, False):
            A.set_flash_fused(fused)
            print(f"backward = {'fused single-pass' if fused else 'two-pass'}:")
            bench_shape(96, 2048, 64, causal=causal)
            bench_shape(48, 2048, 128, causal=causal)
        A.set_flash_fused(True)
        return
    if "--stacked-only" not in sys.argv:
        bench_shape(96, 2048, 64, causal=causal)
    print("head-stacked layout (2 heads -> d=128):")
    bench_shape(48, 2048, 128, causal=causal)


if __name__ == "__main__":
    main()
