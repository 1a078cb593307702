"""Quick chip-health probe: dispatch floor + big-GEMM MFU.

The shared v5e's tenancy varies hour to hour; per-step numbers taken in a
degraded window (observed: ~30 ms dispatch floor vs the usual ~1.1 ms) are
garbage.  Run this FIRST and only trust perf sweeps when floor < 2 ms and
bf16 4096^2 GEMM MFU > 40%.
"""
import os, sys, time
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import lightgrad_tpu  # noqa: F401  (sets up cache/env)
import jax, jax.numpy as jnp

d = jax.devices()[0]
print("device:", d)

# dispatch floor: tiny jitted op, timed singly
f = jax.jit(lambda x: x + 1.0)
x = jnp.zeros((8, 128))
np.asarray(f(x))
ts = []
for _ in range(10):
    t0 = time.time(); np.asarray(f(x)[0, 0]); ts.append(time.time() - t0)
floor = sorted(ts)[len(ts) // 2]
print(f"dispatch floor: {floor*1e3:.2f} ms (median of 10)")

# big GEMM MFU, chained in-program.  Every timed call pays ONE
# dispatch+readback round-trip whose size swings tens of ms call-to-call in
# degraded windows, so a single floor subtraction is invalid; instead time a
# SHORT and a LONG chain (same program shape, iteration count baked in) and
# difference the medians -- the RTT distribution cancels.
N, SHORT, LONG = 4096, 4, 36
a = jnp.ones((N, N), jnp.bfloat16); b = jnp.ones((N, N), jnp.bfloat16)

def make_chain(reps):
    @jax.jit
    def chain(a, b):
        y = a
        for _ in range(reps):
            y = (y @ b) * (1.0 / N)
        return y
    return chain

def med_time(f, reps=5):
    np.asarray(f(a, b)[0, 0])  # compile
    ts = []
    for _ in range(reps):
        t0 = time.time(); np.asarray(f(a, b)[0, 0]); ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]

t_short = med_time(make_chain(SHORT))
t_long = med_time(make_chain(LONG))
dt = max(t_long - t_short, 1e-9) / (LONG - SHORT)
mfu = 2 * N**3 / dt / 197e12   # v5e bf16 peak
print(f"bf16 {N}^2 GEMM: {dt*1e3:.2f} ms = {2*N**3/dt/1e12:.1f} TF/s, "
      f"MFU {mfu:.3f} (two-length differenced, median of 5)")
# Two independent failure modes (observed 2026-08-20: floor 44 ms while the
# differenced GEMM ran at 92% MFU): a degraded TUNNEL only poisons
# single-dispatch timings -- amortized/differenced sweeps stay valid.
if floor < 2e-3 and mfu > 0.40:
    print("HEALTH: OK")
elif mfu > 0.40:
    print("HEALTH: TUNNEL-DEGRADED (compute OK -- trust only amortized or "
          "two-length-differenced timings)")
else:
    print("HEALTH: DEGRADED (compute slow -- do not trust perf sweeps)")
