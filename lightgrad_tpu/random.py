"""Framework RNG state for stochastic ops (dropout & friends).

The reference has no stochastic ops; models fine-tuned through this framework
need dropout.  Design constraint: masks must stay fresh *inside compiled
steps*, so the PRNG key lives in a tensor that every draw mutates -- the
``lightgrad_tpu.jit`` recorder then captures it as mutated state and the
compiled program threads `jax.random.split` through it (a numpy-side RNG
would bake one mask into the executable forever).
"""

import numpy as np
import jax

from .autograd.tpu.tensor import TpuTensor

__all__ = ["seed", "next_key"]

_key = None


def seed(n: int) -> None:
    """(Re)seed the global stochastic-op key."""
    global _key
    _key = TpuTensor(jax.random.PRNGKey(n), requires_grad=False)


def next_key():
    """Split the global key; returns a fresh subkey (as a raw jax array)."""
    if _key is None:
        seed(0)
    new_key, sub = jax.random.split(_key.data)
    _key._set_data(new_key)
    return sub
