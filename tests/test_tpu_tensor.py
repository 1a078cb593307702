"""TPU backend tests (XLA kernel mode on the CPU test mesh).

Mirrors the reference's OpenCL test structure (test_opencl_tensor.py):
forward parity vs numpy / the CPU oracle, the gradcheck matrix with
broadcast+transpose variants, the conv sweep, and the cross-backend
model-gradient comparison.
"""

import numpy as np
import pytest

from lightgrad_tpu.autograd import CpuTensor, TpuTensor

from .common import compare_with_numpy, compare_with_cpu, check_gradients

np.random.seed(1337)


@pytest.fixture(autouse=True)
def _seed_rng():
    # deterministic inputs regardless of suite order (near-ties in max/min
    # gradchecks are input-dependent)
    np.random.seed(1337)


def tpu_np(*args, **kwargs):
    compare_with_numpy(TpuTensor, *args, **kwargs)


def tpu_cpu(*args, **kwargs):
    compare_with_cpu(TpuTensor, *args, **kwargs)


def tpu_check(*args, **kwargs):
    check_gradients(TpuTensor, *args, **kwargs)


# --- forward parity --------------------------------------------------------
def test_transpose():
    tpu_np(lambda t: t.transpose(1, 0), shapes=[(64, 64)])


def test_reshape():
    tpu_np(lambda t: t.reshape(-1), shapes=[(64, 64)])


@pytest.mark.parametrize(
    "name,kw",
    [
        ("sin", {}), ("cos", {}), ("exp", {}),
    ],
)
def test_unary_forward(name, kw):
    tpu_np(name, shapes=[(64, 64)], **kw)


def test_unary_forward_vs_cpu():
    tpu_cpu("log", shapes=[(64, 64)], lowhigh=(0.1, 1))
    tpu_cpu("tanh", shapes=[(64, 64)])
    tpu_cpu("sigmoid", shapes=[(64, 64)])
    tpu_cpu("relu", shapes=[(64, 64)])
    tpu_cpu("gelu", shapes=[(33, 65)])


def test_binary_forward():
    tpu_np(lambda a, b: a + b, shapes=[(64, 64), (64, 64)], broadcast=True)
    tpu_np(lambda a, b: a - b, shapes=[(64, 64), (64, 64)], broadcast=True)
    tpu_np(lambda a, b: a * b, shapes=[(64, 64), (64, 64)], broadcast=True)
    tpu_np(lambda a, b: a ** b, shapes=[(64, 64), (64, 64)], broadcast=True, lowhigh=(0.1, 1))
    tpu_np(lambda a, b: a / b, shapes=[(64, 64), (64, 64)], broadcast=True, lowhigh=(0.1, 10))


def test_dot_forward():
    tpu_np(lambda a, b: a @ b, shapes=[(64, 64), (64, 64)], transpose=True)
    tpu_np(lambda a, b: a @ b, shapes=[(32, 64), (64, 128)])
    tpu_np(lambda a, b: a @ b, shapes=[(13, 54), (54, 76)])
    tpu_np(lambda a, b: a @ b, shapes=[(3, 13, 54), (3, 54, 19)])


@pytest.mark.parametrize("name", ["sum", "mean", "min", "max"])
@pytest.mark.parametrize("axis", [None, 0, 1])
def test_reductions_forward(name, axis):
    kwargs = {} if axis is None else {"axis": axis}
    tpu_np(name, shapes=[(64, 64)], **kwargs)


def test_conv_sweep():
    # reduced version of the reference's 6-deep sweep (opencl test_conv)
    for dim in [1, 2, 3]:
        for stride in [1, 2]:
            for kernel in [3, 5]:
                shape = 9 if dim < 3 else 6
                if kernel > shape:
                    continue
                k_np = np.random.uniform(-1, 1, (3, 2) + (kernel,) * dim).astype(np.float32)
                cpu_k, tpu_k = CpuTensor.from_numpy(k_np), TpuTensor.from_numpy(k_np)
                tpu_cpu(
                    lambda x: x.conv(tpu_k if isinstance(x, TpuTensor) else cpu_k, strides=stride),
                    shapes=[(2, 2) + (shape,) * dim],
                )


def test_getitem_forward():
    tpu_np(lambda t: t[3:9, 4:5], shapes=[(16, 16)])
    tpu_np(lambda t: t[np.array([0, 5, 5]), np.array([1, 2, 3])], shapes=[(8, 8)])


def test_pool_forward_vs_cpu():
    tpu_cpu(lambda x: x.max_pool(kernel=(2, 2)), shapes=[(2, 3, 8, 8)])
    tpu_cpu(lambda x: x.mean_pool(kernel=(2, 2)), shapes=[(2, 3, 7, 7)])
    tpu_cpu(lambda x: x.min_pool(kernel=(3, 3)), shapes=[(1, 2, 9, 9)])


def test_pad_forward_vs_cpu():
    tpu_cpu(lambda x: x.pad(2), shapes=[(2, 3, 6, 6)])
    tpu_cpu(lambda x: x.pad((1, 3)), shapes=[(2, 3, 6, 6)])


# --- gradients -------------------------------------------------------------
def test_transpose_grad():
    tpu_check(lambda x: TpuTensor.transpose(x, 1, 0), shapes=[(15, 15)])


def test_reshape_grad():
    tpu_check(lambda x: TpuTensor.reshape(x, -1), shapes=[(15, 15)])


@pytest.mark.parametrize(
    "name,kw",
    [
        ("neg", {}), ("sin", {}), ("cos", {}),
        # TPU VPU transcendentals carry ~1 extra ulp vs libm; same per-op
        # tolerance-override spirit as the reference (test_cpu_tensor.py:27,37)
        ("exp", {"tol": 1.5e-3}),
        ("log", {"lowhigh": (0.1, 10), "eps": 5e-3, "tol": 5e-3}),
        ("sigmoid", {}), ("tanh", {"eps": 1e-2, "tol": 5e-3}),
        ("relu", {"eps": 1e-5, "tol": 0.002}),
    ],
)
def test_unary_grad(name, kw):
    tpu_check(name, shapes=[(15, 15)], broadcast=True, transpose=True, **kw)


@pytest.mark.parametrize(
    "name,kw",
    [
        ("add", {}), ("sub", {}), ("mul", {}),
        # f32 central differences at eps=1e-5 carry ~1e-2 roundoff noise for
        # pow (computed as exp(b*log(a))); TPU rounding sits slightly above
        # the CPU oracle's margin
        ("pow", {"lowhigh": (1, 2), "eps": 1e-3, "tol": 0.02}),
    ],
)
def test_binary_grad(name, kw):
    tpu_check(name, shapes=[(10, 15), (10, 15)], broadcast=True, **kw)


def test_div_grad():
    tpu_check("div", shapes=[(10, 15), (10, 15)], broadcast=True, lowhigh=(0.1, 10), tol=5e-3)


def test_scalar_ops_grad():
    tpu_check(lambda x: x * 3.0 + 1.5, shapes=[(5, 6)])
    tpu_check(lambda x: 2.0 - x, shapes=[(5, 6)])
    tpu_check(lambda x: 1.0 / x, shapes=[(5, 6)], lowhigh=(0.5, 2), tol=5e-3)
    tpu_check(lambda x: x ** 2.0, shapes=[(5, 6)])


@pytest.mark.parametrize("axis", [None, 0, 1])
def test_sum_grad(axis):
    tpu_check("sum", shapes=[(4, 5)], axis=axis, transpose=True)


@pytest.mark.parametrize("name", ["max", "min"])
@pytest.mark.parametrize("axis", [None, 0, 1])
def test_minmax_grad(name, axis):
    kwargs = {} if axis is None else {"axis": axis}
    tpu_check(name, shapes=[(4, 4)], **kwargs)


def test_dot_grad():
    tpu_check("dot", shapes=[(10, 15), (15, 10)])
    tpu_check("dot", shapes=[(2, 5, 7), (2, 7, 4)])


def test_conv_grad():
    tpu_check(TpuTensor.conv, shapes=[(2, 2, 5, 5), (3, 2, 3, 3)], strides=1)
    tpu_check(TpuTensor.conv, shapes=[(2, 2, 6, 6), (3, 2, 3, 3)], strides=2)


def test_pad_grad():
    tpu_check(lambda x: x.pad(padding=2), shapes=[(7, 9)])


def test_getitem_grad():
    tpu_check(lambda x: x[1:5, 2:4], shapes=[(6, 6)])
    tpu_check(lambda x: x[np.array([0, 2, 2]), np.array([1, 0, 1])], shapes=[(4, 3)])


def test_softmax_grad():
    tpu_check(lambda x: x.softmax(axis=-1), shapes=[(5, 7)])


def test_pool_grad():
    from lightgrad_tpu.utils.gradcheck import assert_gradcheck

    vals = (np.random.permutation(36).astype(np.float32) / 8.0).reshape(1, 1, 6, 6)
    assert_gradcheck(
        lambda t: t.max_pool(kernel=(2, 2)), TpuTensor.from_numpy(vals)
    )


# --- cross-backend model gradients (the reference's strongest test) --------
def test_model_grads_match_cpu():
    import lightgrad_tpu.nn as nn

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.l1 = nn.Linear(8, 16)
            self.l2 = nn.Linear(16, 4)

        def forward(self, x):
            return self.l2(self.l1(x).tanh()).softmax(axis=-1)

    cpu_model = Model().map_parameters(lambda p: p.cpu())
    tpu_model = Model().map_parameters(lambda p: p.cpu())
    tpu_model.load_parameters(cpu_model.state_dict())
    tpu_model.map_parameters(lambda p: p.tpu())

    x = np.random.uniform(-1, 1, (16, 8)).astype(np.float32)
    cpu_loss = (cpu_model(CpuTensor.from_numpy(x)) ** 2.0).sum()
    tpu_loss = (tpu_model(TpuTensor.from_numpy(x)) ** 2.0).sum()
    np.testing.assert_allclose(cpu_loss.numpy(), tpu_loss.numpy(), rtol=1e-4, atol=1e-4)
    cpu_loss.backward()
    tpu_loss.backward()
    for (name, cp), (_, tp) in zip(
        cpu_model.named_parameters(), tpu_model.named_parameters()
    ):
        np.testing.assert_allclose(
            cp.grad.numpy(), tp.grad.numpy(), rtol=5e-4, atol=5e-4, err_msg=name
        )


def test_narrow():
    tpu_cpu(lambda t: t.narrow(2, 3), shapes=[(9, 4)])
    tpu_check(lambda x: x.narrow(1, 4, axis=1), shapes=[(3, 7)])
    # traced (tensor) start index
    x = TpuTensor.from_numpy(np.arange(20, dtype=np.float32).reshape(10, 2))
    s = TpuTensor.from_numpy(np.int32(4), requires_grad=False)
    np.testing.assert_array_equal(x.narrow(s, 3).numpy(), x.numpy()[4:7])
