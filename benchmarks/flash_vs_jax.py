"""Sanity bar for our flash kernel: time jax's own TPU pallas kernels
(legacy flash_attention and splash_attention) at the bench shapes, same
in-program chained fwd+bwd protocol as benchmarks/flash_tune.py.

If the platform's own kernels land at the same MFU, ours is at parity and
the remaining gap is structural (d=64 contraction / VPU exp cost), not an
implementation deficiency.

Usage: python benchmarks/flash_vs_jax.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from lightgrad_tpu.ops.runtime import on_tpu
from benchmarks.bench_util import time_median

on_tpu()

CHAIN = 3


def bench_impl(name, attn_fn, b, h, s, d, causal=False):
    """attn_fn: (q, k, v) -> out, all (b, h, s, d); differentiable."""
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(
        rng.normal(size=(b, h, s, d)).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    flops = 4 * b * h * s * s * d * 3.5 * (0.5 if causal else 1.0)

    def chain(q0):
        qq = q0
        for _ in range(CHAIN):
            out, vjp = jax.vjp(attn_fn, qq, k, v)
            dq, dk, dv = vjp(out)
            qq = dq.astype(q0.dtype)
        return qq

    try:
        f = jax.jit(chain)
        dt, _ = time_median(lambda: f(q), iters=4, repeats=5)
        per = dt / CHAIN
        tf = flops / per / 1e12
        print(f"  {name:28s} ({b}x{h}x{s}x{d}{' causal' if causal else ''}): "
              f"{per*1e3:7.2f}ms {tf:6.1f}TF/s (mfu {tf/197:.3f})", flush=True)
    except Exception as e:
        print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


def jax_legacy(q, k, v):
    from jax.experimental.pallas.ops.tpu import flash_attention as F
    return F.flash_attention(q, k, v, causal=False,
                             sm_scale=1.0 / np.sqrt(q.shape[-1]))


def make_splash(h, s, d):
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk, splash_attention_mask as sm)
    mask = sm.MultiHeadMask([sm.FullMask((s, s)) for _ in range(h)])
    kernel = sk.make_splash_mha(mask=mask, head_shards=1, q_seq_shards=1)

    def attn(q, k, v):
        # splash expects (h, s, d) per batch element; vmap over batch.
        # it applies no sm_scale internally at default settings; fold into q
        scale = 1.0 / np.sqrt(d)
        return jax.vmap(kernel)(q * scale, k, v)

    return attn


def ours(q, k, v):
    from lightgrad_tpu.ops import attention as A
    b, h, s, d = q.shape
    scale = 1.0 / np.sqrt(d)
    r = lambda x: x.reshape(b * h, s, d)

    def f(q, k, v):
        (out, lse), vjp_in = jax.vjp(
            lambda a, bb, c: A._attn_res(a, bb, c, scale, False, "pallas"),
            r(q), r(k), r(v))
        return out.reshape(b, h, s, d)

    return f(q, k, v)


def ours_attn(q, k, v):
    from lightgrad_tpu.ops import attention as A
    b, h, s, d = q.shape
    scale = 1.0 / np.sqrt(d)
    out, _ = A._attn_res(q.reshape(b * h, s, d), k.reshape(b * h, s, d),
                         v.reshape(b * h, s, d), scale, False, "pallas")
    return out.reshape(b, h, s, d)


def main():
    print(f"device: {jax.devices()[0]}")
    for (b, h, s, d) in [(8, 12, 2048, 64), (4, 12, 2048, 128)]:
        bench_impl("ours", ours_attn, b, h, s, d)
        bench_impl("jax legacy flash", jax_legacy, b, h, s, d)
        bench_impl("jax splash", make_splash(h, s, d), b, h, s, d)


if __name__ == "__main__":
    main()
