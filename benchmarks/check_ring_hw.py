"""Hardware smoke for the flash-block ring path: on the single real chip the
sp mesh is 1-wide, so instead exercise the pieces the ring composes --
flash_block fwd/bwd with a nonzero lse cotangent -- against the XLA oracle,
on real Mosaic lowering (not interpret mode)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from lightgrad_tpu.ops.attention import flash_block
from lightgrad_tpu.parallel.ring_attention import _xla_block

rng = np.random.default_rng(0)
B, S, D = 4, 2048, 64
q, k, v = (jnp.asarray(rng.normal(0, 0.5, (B, S, D)).astype(np.float32))
           for _ in range(3))
scale = 1.0 / np.sqrt(D)

for causal in (False, True):
    def loss_flash(q, k, v):
        out, lse = flash_block(q, k, v, scale, causal)
        return jnp.sum(out ** 2) + jnp.sum(jnp.sin(lse))

    def loss_xla(q, k, v):
        out, lse = _xla_block(q, k, v, scale, causal)
        return jnp.sum(out ** 2) + jnp.sum(jnp.sin(lse))

    of, lf = jax.jit(lambda q, k, v: flash_block(q, k, v, scale, causal))(q, k, v)
    ox, lx = jax.jit(lambda q, k, v: _xla_block(q, k, v, scale, causal))(q, k, v)
    np.testing.assert_allclose(np.asarray(of), np.asarray(ox), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lx), rtol=2e-4, atol=2e-4)
    gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(q, k, v)
    for a, b, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4, err_msg=name)
    print(f"causal={causal}: flash_block fwd+bwd+dlse match XLA on hardware")

print("OK")
