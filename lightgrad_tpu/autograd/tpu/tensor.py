"""The TPU tensor: a ``jax.Array`` wrapped in the define-by-run tape.

TPU-native replacement for the reference's OpenCLTensor
(``/root/reference/lightgrad/autograd/opencl/tensor.py``).  Design deltas:

* storage is an immutable ``jax.Array`` -- "in-place" ops swap the buffer via
  ``_set_data`` (the tensor object identity is the mutable cell), so ``copy``
  is free buffer aliasing and there is no stride/view machinery: XLA owns
  layout (the reference's zero-copy stride tricks don't map to TPU tiled
  memory, SURVEY.md §7).
* dispatch is asynchronous: ops return as soon as XLA enqueues; ``numpy()`` /
  ``item()`` are the sync points (the reference blocked on every kernel,
  kernels.py:194).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..tensor import AbstractTensor

__all__ = ["TpuTensor"]

# most recent op output; lets the profiler wait for true device completion
_LAST = [None]


def _note(arr):
    _LAST[0] = arr
    return arr


def _sync():
    if _LAST[0] is not None:
        jax.block_until_ready(_LAST[0])


from ...utils.profiler import set_sync_fn

set_sync_fn(_sync)


class TpuTensor(AbstractTensor):
    def __init__(self, data, requires_grad: bool = True, dtype=None):
        if not isinstance(data, jax.Array):
            data = jnp.asarray(data, dtype=dtype)
        elif dtype is not None and data.dtype != dtype:
            data = data.astype(dtype)
        super().__init__(data, requires_grad=requires_grad)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def shape(self) -> tuple:
        return tuple(self.data.shape)

    # --- initializers ------------------------------------------------------
    @staticmethod
    def empty(shape, requires_grad: bool = True, dtype=jnp.float32) -> "TpuTensor":
        # XLA has no uninitialized alloc; zeros compiles to a cheap broadcast
        return TpuTensor(jnp.zeros(shape, dtype=dtype), requires_grad=requires_grad)

    @staticmethod
    def zeros(shape, requires_grad: bool = True, dtype=jnp.float32) -> "TpuTensor":
        return TpuTensor(jnp.zeros(shape, dtype=dtype), requires_grad=requires_grad)

    @staticmethod
    def ones(shape, requires_grad: bool = True, dtype=jnp.float32) -> "TpuTensor":
        return TpuTensor(jnp.ones(shape, dtype=dtype), requires_grad=requires_grad)

    @staticmethod
    def uniform(low, high, shape, requires_grad: bool = True) -> "TpuTensor":
        # host-side numpy RNG for reproducibility parity with the reference
        # (tests seed np.random); jax PRNG is used on the functional path
        a = np.random.uniform(low, high, size=shape).astype(np.float32)
        return TpuTensor(jnp.asarray(a), requires_grad=requires_grad)

    @staticmethod
    def from_numpy(a: np.ndarray, requires_grad: bool = True) -> "TpuTensor":
        a = np.asarray(a)
        if a.dtype.kind in "iub":
            # jax runs in 32-bit mode; narrow wide integer types up front
            dtype = {np.dtype(np.int64): np.int32, np.dtype(np.uint64): np.uint32}.get(
                a.dtype, a.dtype
            )
        else:
            dtype = np.float32
        return TpuTensor(jnp.asarray(a, dtype=dtype), requires_grad=requires_grad)

    def copy(self, requires_grad: bool = True) -> "TpuTensor":
        # jax.Arrays are immutable; aliasing is a correct zero-cost copy
        return TpuTensor(self.data, requires_grad=requires_grad)

    def numpy(self) -> np.ndarray:
        return np.asarray(self.data)


AbstractTensor.register_backend("tpu", TpuTensor)
