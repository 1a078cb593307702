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

# big GEMM MFU, chained in-program
N = 4096
a = jnp.ones((N, N), jnp.bfloat16); b = jnp.ones((N, N), jnp.bfloat16)
@jax.jit
def chain(a, b):
    y = a
    for _ in range(8):
        y = (y @ b) * (1.0 / N)
    return y
np.asarray(chain(a, b)[0, 0])
t0 = time.time(); np.asarray(chain(a, b)[0, 0]); dt = (time.time() - t0) / 8
mfu = 2 * N**3 / dt / 394e12
print(f"bf16 {N}^2 GEMM: {dt*1e3:.2f} ms = {2*N**3/dt/1e12:.1f} TF/s, MFU {mfu:.3f}")
print("HEALTH:", "OK" if (floor < 2e-3 and mfu > 0.40) else "DEGRADED")
