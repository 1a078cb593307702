"""Numpy-backed tensor: the golden oracle backend.

Parity with the reference ``CpuTensor`` (``/root/reference/lightgrad/autograd/
cpu/tensor.py``): float32 default dtype, numpy storage, full initializer
contract.  Serves as the reference oracle the TPU backend is tested against
(the reference's "compare_with_cpu" pattern, test/common.py:71-102).
"""

import numpy as np

from ..tensor import AbstractTensor

__all__ = ["CpuTensor"]


class CpuTensor(AbstractTensor):
    def __init__(self, data, requires_grad: bool = True, dtype=np.float32):
        if not isinstance(data, np.ndarray):
            data = np.asarray(data)
        if dtype is not None and data.dtype != dtype:
            data = data.astype(dtype)
        if not data.flags.writeable:
            # e.g. views over jax device buffers (TpuTensor.numpy())
            data = data.copy()
        super().__init__(data, requires_grad=requires_grad)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def shape(self) -> tuple:
        return tuple(self.data.shape)

    # --- initializers ------------------------------------------------------
    @staticmethod
    def empty(shape, requires_grad: bool = True, dtype=np.float32) -> "CpuTensor":
        return CpuTensor(np.empty(shape, dtype=dtype), requires_grad=requires_grad, dtype=dtype)

    @staticmethod
    def zeros(shape, requires_grad: bool = True, dtype=np.float32) -> "CpuTensor":
        return CpuTensor(np.zeros(shape, dtype=dtype), requires_grad=requires_grad, dtype=dtype)

    @staticmethod
    def ones(shape, requires_grad: bool = True, dtype=np.float32) -> "CpuTensor":
        return CpuTensor(np.ones(shape, dtype=dtype), requires_grad=requires_grad, dtype=dtype)

    @staticmethod
    def uniform(low, high, shape, requires_grad: bool = True) -> "CpuTensor":
        return CpuTensor(
            np.random.uniform(low, high, size=shape).astype(np.float32),
            requires_grad=requires_grad,
        )

    @staticmethod
    def from_numpy(a: np.ndarray, requires_grad: bool = True) -> "CpuTensor":
        a = np.asarray(a)
        # keep integer arrays intact (labels/ids); cast floats to float32
        dtype = a.dtype if a.dtype.kind in "iub" else np.float32
        return CpuTensor(a, requires_grad=requires_grad, dtype=dtype)

    def copy(self, requires_grad: bool = True) -> "CpuTensor":
        return CpuTensor(self.data.copy(), requires_grad=requires_grad, dtype=self.data.dtype)

    def numpy(self) -> np.ndarray:
        return self.data


AbstractTensor.register_backend("cpu", CpuTensor)
