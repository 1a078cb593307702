"""CPU-oracle gradcheck matrix (mirror of the reference's test_cpu_tensor.py
coverage, plus the ops the reference left unchecked: sum, mean, pool, pad
variants, getitem)."""

import numpy as np
import pytest

from lightgrad_tpu.autograd import CpuTensor

from .common import check_gradients

np.random.seed(1234)


@pytest.fixture(autouse=True)
def _seed_rng():
    # deterministic inputs regardless of suite order (near-ties in max/min
    # gradchecks are input-dependent)
    np.random.seed(1234)


def cpu_check(*args, **kwargs):
    check_gradients(CpuTensor, *args, **kwargs)


# --- transformations -------------------------------------------------------
def test_transpose():
    cpu_check(CpuTensor.transpose, shapes=[(23, 33)])  # (45,65) was 35s of O(n^2) jacobian


def test_reshape():
    # (45,65) was 22 s of O(n^2) finite-difference jacobian; same coverage
    cpu_check(lambda x: CpuTensor.reshape(x, -1), shapes=[(23, 33)])


def test_pad():
    cpu_check(lambda x: CpuTensor.pad(x, padding=2), shapes=[(14, 17)])


def test_getitem():
    cpu_check(lambda x: x[2:7, 1:4], shapes=[(9, 5)])
    cpu_check(lambda x: x[np.array([0, 2, 2]), np.array([1, 0, 1])], shapes=[(4, 3)])


# --- unary -----------------------------------------------------------------
@pytest.mark.parametrize(
    "name,kw",
    [
        ("neg", {}),
        ("sin", {}),
        ("cos", {}),
        ("exp", {}),
        ("log", {"lowhigh": (0.1, 10)}),
        ("sigmoid", {}),
        ("tanh", {}),
        ("relu", {"eps": 1e-5, "tol": 0.002}),
        ("gelu", {"tol": 2e-3}),
    ],
)
def test_unary(name, kw):
    cpu_check(name, shapes=[(10, 15)], **kw)


# --- reductions ------------------------------------------------------------
@pytest.mark.parametrize("name", ["max", "min"])
def test_minmax(name):
    cpu_check(name, shapes=[(10, 15)])


@pytest.mark.parametrize("axis", [None, 0, 1, (0, 1)])
def test_sum(axis):
    cpu_check("sum", shapes=[(6, 7)], axis=axis)


@pytest.mark.parametrize("axis", [None, 0, 1])
def test_mean(axis):
    cpu_check("mean", shapes=[(6, 7)], axis=axis)


# --- binary ----------------------------------------------------------------
@pytest.mark.parametrize(
    "name,kw",
    [
        ("add", {}),
        ("sub", {}),
        ("mul", {}),
        ("pow", {"lowhigh": (1, 2), "eps": 1e-5, "tol": 0.01}),
    ],
)
def test_binary(name, kw):
    cpu_check(name, shapes=[(10, 15), (10, 15)], broadcast=True, **kw)


def test_div():
    cpu_check("div", shapes=[(10, 15), (10, 15)], broadcast=True, lowhigh=(0.1, 10), tol=5e-3)
    cpu_check("div", shapes=[(10, 15), (10, 15)], broadcast=True, lowhigh=(-10, -0.1), tol=5e-3)


def test_dot():
    cpu_check(CpuTensor.dot, shapes=[(10, 15), (15, 10)])


def test_dot_batched():
    cpu_check(CpuTensor.dot, shapes=[(2, 5, 7), (2, 7, 4)])


def test_conv():
    cpu_check(CpuTensor.conv, shapes=[(3, 2, 5, 5), (4, 2, 3, 3)], strides=1)
    cpu_check(CpuTensor.conv, shapes=[(2, 2, 6, 6), (3, 2, 3, 3)], strides=2)


def test_pool():
    from lightgrad_tpu.utils.gradcheck import assert_gradcheck

    # tie-free input: max/min gradchecks are undefined when two window
    # elements are within the finite-difference eps of each other
    vals = (np.random.permutation(36).astype(np.float32) / 8.0).reshape(1, 1, 6, 6)
    x = CpuTensor.from_numpy(vals)
    assert_gradcheck(lambda t: t.max_pool(kernel=(2, 2)), x)
    assert_gradcheck(lambda t: t.min_pool(kernel=(2, 2)), x)
    cpu_check(lambda x: x.mean_pool(kernel=(2, 2)), shapes=[(1, 1, 5, 5)], tol=2e-3)


# --- composite model -------------------------------------------------------
def test_linear_model():
    import lightgrad_tpu.nn as nn

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.l1 = nn.Linear(8, 16)
            self.l2 = nn.Linear(16, 4)

        def forward(self, x):
            return self.l2(self.l1(x).tanh())

    model = Model()
    model.map_parameters(lambda p: p.cpu())
    cpu_check(model, shapes=[(16, 8)])


def test_softmax_grad():
    cpu_check(lambda x: x.softmax(axis=-1), shapes=[(5, 7)])
