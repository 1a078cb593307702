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


# device-side initialization (opt-in): a jax PRNG key chain used by
# TpuTensor.uniform instead of host numpy + upload.  None -> host RNG.
_DEVICE_INIT_KEY = None


def set_device_init(seed=None):
    """Route parameter initialization through the on-device jax PRNG.

    ``set_device_init(seed)`` makes ``Tensor.uniform`` (and everything built
    on it: xavier, fan-in init, every nn layer constructor) generate directly
    in device memory; ``set_device_init(None)`` restores the host-numpy RNG
    (reproducibility parity with the reference, which seeds ``np.random``).
    Use when constructing big models from scratch: the host path uploads
    every buffer through the device link (slow on tunneled/remote chips),
    the device path moves no bytes.
    """
    global _DEVICE_INIT_KEY
    _DEVICE_INIT_KEY = None if seed is None else jax.random.PRNGKey(int(seed))


def _device_init_key():
    return _DEVICE_INIT_KEY


def _next_device_init_key():
    global _DEVICE_INIT_KEY
    _DEVICE_INIT_KEY, k = jax.random.split(_DEVICE_INIT_KEY)
    return k


class TpuTensor(AbstractTensor):
    # host-born value cache: tensors created from numpy keep their host copy
    # so the jit recorder's CPU staging (jit.py _Recorder.on_read) can rebuild
    # the host buffer locally instead of pulling the device array back through
    # a (possibly tunneled, ~MB/s) device link.  Invalidated on any buffer
    # swap; costs host RAM equal to the host-born tensors alive (params,
    # device-resident datasets) -- the exact set the recorder reads.
    _host_value = None

    def __init__(self, data, requires_grad: bool = True, dtype=None):
        host_value = None
        if not isinstance(data, jax.Array):
            host_value = np.asarray(data, dtype=dtype)
            data = jnp.asarray(host_value)
        elif dtype is not None and data.dtype != dtype:
            data = data.astype(dtype)
        super().__init__(data, requires_grad=requires_grad)
        if (host_value is not None and host_value.nbytes >= (1 << 16)
                and host_value.dtype == np.dtype(data.dtype)):
            # small tensors aren't worth the RAM/bookkeeping; a dtype change
            # during jnp.asarray (e.g. f64 list inputs narrowed by 32-bit
            # mode) makes the host copy unusable as a stand-in
            self._host_value = host_value

    def _set_data(self, data):
        # super() fires the jit recorder's on_write hook BEFORE the swap, and
        # the abstract-mode pre-write snapshot wants the host mirror intact --
        # only invalidate it once the new buffer is actually in place
        r = super()._set_data(data)
        self._host_value = None
        return r

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
        if _device_init_key() is not None:
            # device-side init (opt-in, set_device_init): the host-RNG path
            # below uploads every parameter through the device link -- ~300 s
            # of a GPT-2 124M build through the tunneled chip is that
            # transfer -- while jax.random generates in HBM directly
            a = jax.random.uniform(
                _next_device_init_key(), shape, jnp.float32,
                minval=float(low), maxval=float(high))
            return TpuTensor(a, requires_grad=requires_grad)
        # host-side numpy RNG for reproducibility parity with the reference
        # (tests seed np.random); jax PRNG is used on the functional path
        a = np.random.uniform(low, high, size=shape).astype(np.float32)
        # pass the RAW numpy through: __init__ keeps it as the host-value
        # cache the jit recorder stages from (no device->host pull)
        return TpuTensor(a, requires_grad=requires_grad)

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
        # raw numpy in: __init__ caches it as the staging host value
        return TpuTensor(a, requires_grad=requires_grad, dtype=dtype)

    def copy(self, requires_grad: bool = True) -> "TpuTensor":
        # jax.Arrays are immutable; aliasing is a correct zero-cost copy
        return TpuTensor(self.data, requires_grad=requires_grad)

    def numpy(self) -> np.ndarray:
        return np.asarray(self.data)


AbstractTensor.register_backend("tpu", TpuTensor)
