"""Shared parametrized checkers (the reference's test/common.py pattern):

* forward parity vs numpy               (rtol=atol=1e-5)
* forward parity vs the CPU oracle      (rtol=atol=1e-3)
* analytic-vs-numerical gradcheck       (tol=5e-4, per-op overrides)

Input generation sweeps broadcast variants (each dim collapsed to 1) and
transposed variants, exercising the broadcast/stride-0 kernel paths.
"""

import numpy as np

from lightgrad_tpu.autograd import AbstractTensor, CpuTensor
from lightgrad_tpu.utils.gradcheck import assert_gradcheck


def input_variants(cls, shapes, lowhigh=(-1, 1), broadcast=False, transpose=False):
    """Yield (numpy_arrays, tensor_arrays) pairs over the variant sweep."""
    base = [np.random.uniform(*lowhigh, size=s).astype(np.float32) for s in shapes]

    def pack(arrs):
        return arrs, [cls.from_numpy(a) for a in arrs]

    yield pack(base)
    if broadcast:
        for i, shape in enumerate(shapes):
            for d in range(len(shape)):
                collapsed = shape[:d] + (1,) + shape[d + 1 :]
                arr = np.random.uniform(*lowhigh, size=collapsed).astype(np.float32)
                yield pack(base[:i] + [arr] + base[i + 1 :])
    if transpose:
        for i, (arr, shape) in enumerate(zip(base, shapes)):
            perm = tuple(reversed(range(len(shape))))
            yield pack(base[:i] + [arr.transpose(perm)] + base[i + 1 :])


def compare_with_numpy(cls, fn_or_name, shapes, lowhigh=(-1, 1),
                       broadcast=False, transpose=False, **kwargs):
    if isinstance(fn_or_name, str):
        np_fn, cls_fn = getattr(np, fn_or_name), getattr(cls, fn_or_name)
    else:
        np_fn = cls_fn = fn_or_name
    for np_arrays, tensors in input_variants(cls, shapes, lowhigh, broadcast, transpose):
        expect = np_fn(*np_arrays, **kwargs)
        got = cls_fn(*tensors, **kwargs).numpy()
        np.testing.assert_allclose(expect, got, rtol=1e-5, atol=1e-5)


def compare_with_cpu(cls, fn_or_name, shapes, lowhigh=(-1, 1),
                     broadcast=False, transpose=False, **kwargs):
    if isinstance(fn_or_name, str):
        cpu_fn, cls_fn = getattr(CpuTensor, fn_or_name), getattr(cls, fn_or_name)
    else:
        cpu_fn = cls_fn = fn_or_name
    for np_arrays, tensors in input_variants(cls, shapes, lowhigh, broadcast, transpose):
        cpu_tensors = [CpuTensor.from_numpy(a) for a in np_arrays]
        expect = cpu_fn(*cpu_tensors, **kwargs).numpy()
        got = cls_fn(*tensors, **kwargs).numpy()
        np.testing.assert_allclose(expect, got, rtol=1e-3, atol=1e-3)


def check_gradients(cls, fn_or_name, shapes, lowhigh=(-1, 1), broadcast=False,
                    transpose=False, eps=1e-3, tol=5e-4, **kwargs):
    fn = getattr(cls, fn_or_name) if isinstance(fn_or_name, str) else fn_or_name
    for _, tensors in input_variants(cls, shapes, lowhigh, broadcast, transpose):
        for i, arr in enumerate(tensors):
            f = lambda x: fn(*tensors[:i], x, *tensors[i + 1 :], **kwargs)
            assert_gradcheck(f=f, x=arr, eps=eps, atol=tol, rtol=tol)
