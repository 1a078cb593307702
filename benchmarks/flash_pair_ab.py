"""A/B the INTEGRATED head-pair flash forward (ops/attention.py
_fwd_kernel_pair) against the one-head kernel, on hardware, interleaved
pair-differenced (robust to 25-770 ms tunnel RTT swings).

Run: timeout 1800 python benchmarks/flash_pair_ab.py
"""

import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from lightgrad_tpu.ops import attention as A


def make_chain(n, k, v, scale, causal):
    @jax.jit
    def f(q):
        x = q
        for _ in range(n):
            x, _ = A._flash_fwd(x, k, v, scale, causal)
        return x
    return f


def diff_time(make, arg, c_short=4, c_long=60, repeats=9):
    f_s, f_l = make(c_short), make(c_long)

    def once(f):
        t0 = time.time()
        np.asarray(f(arg))[0]
        return time.time() - t0

    once(f_s), once(f_l)
    diffs = []
    for _ in range(repeats):
        s = once(f_s)
        l = once(f_l)
        diffs.append(l - s)
    diffs.sort()
    return diffs[len(diffs) // 2] / (c_long - c_short)


def ab_interleaved(f_a, f_b, arg, chain, repeats=15):
    """Median of back-to-back (A - B) program-time differences: the tunnel
    RTT cancels within each adjacent pair, and the compute difference is
    ``chain`` calls' worth -- a far stronger ranking signal than comparing
    two independently-differenced absolute numbers measured minutes apart
    (those flipped sign between two 2026-08-21 windows)."""
    def once(f):
        t0 = time.time()
        np.asarray(f(arg))[0]
        return time.time() - t0

    once(f_a), once(f_b)
    diffs = []
    for _ in range(repeats):
        a = once(f_a)
        b = once(f_b)
        diffs.append(a - b)
    diffs.sort()
    med = diffs[len(diffs) // 2]
    return med / chain, [round(x, 5) for x in diffs]


def main(bh=96, s=2048, d=64, chain=60):
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.normal(size=(bh, s, d)) * 0.1, jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    scale = 1.0 / np.sqrt(d)
    flops = 4 * bh * s * s * d

    for causal in (False, True):
        cf = flops * (0.5 if causal else 1.0)
        A.set_flash_pair(True)
        f_pair = make_chain(chain, k, v, scale, causal)
        A.set_flash_pair(False)
        f_single = make_chain(chain, k, v, scale, causal)
        # absolute per-call for the single kernel (two-length differenced)
        A.set_flash_pair(False)
        dt_single = diff_time(lambda n: make_chain(n, k, v, scale, causal), q)
        d_ab, spread = ab_interleaved(f_pair, f_single, q, chain)
        dt_pair = dt_single + d_ab
        print(f"causal={causal}: single {dt_single*1e3:.2f} ms "
              f"(mfu {cf/dt_single/197e12:.3f}), pair-single "
              f"{d_ab*1e3:+.3f} ms/call -> pair {dt_pair*1e3:.2f} ms "
              f"(mfu {cf/dt_pair/197e12:.3f}); "
              f"pair/single {dt_pair/dt_single:.3f}", flush=True)
        print(f"  per-pair diff spread (s, {chain}-call programs): {spread}",
              flush=True)
    A.set_flash_pair(True)


if __name__ == "__main__":
    main()
