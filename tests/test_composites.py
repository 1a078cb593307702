"""The L3 composite layer tested in its own right (no backend overrides).

A bare-bones numpy backend registers ONLY tape primitives (neg / exp / add /
mul / pow / sum / max / min / reshape / transpose / getitem / setitem / iadd /
fill) -- none of the fused activation overrides the CPU/TPU backends install
-- so ``sigmoid/tanh/softmax/gelu/mean/pool`` here exercise the
device-agnostic composite fallbacks in ``lightgrad_tpu/autograd/ops.py``
directly.  Regression anchor: the reference's own composite tanh was wrong
(``/root/reference/lightgrad/autograd/ops.py:58-60`` computes tanh(x/2)),
masked everywhere by backend overrides; these tests fail on that bug.
"""

import numpy as np
import pytest

from lightgrad_tpu.autograd import AbstractTensor
from lightgrad_tpu.autograd.function import Function
from lightgrad_tpu.utils.gradcheck import assert_gradcheck


def _t(a):
    return BareTensor(np.asarray(a, dtype=np.float32), requires_grad=False)


def _raw(x):
    return x.data if isinstance(x, AbstractTensor) else x


class BareTensor(AbstractTensor):
    """Minimal numpy backend: primitives only, every composite inherited."""

    def __init__(self, data, requires_grad: bool = True):
        super().__init__(np.asarray(data, dtype=np.float32), requires_grad)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def shape(self):
        return self.data.shape

    @staticmethod
    def zeros(shape, requires_grad=True, dtype=np.float32):
        return BareTensor(np.zeros(shape, dtype), requires_grad)

    @staticmethod
    def ones(shape, requires_grad=True, dtype=np.float32):
        return BareTensor(np.ones(shape, dtype), requires_grad)

    @staticmethod
    def empty(shape, requires_grad=True, dtype=np.float32):
        return BareTensor(np.empty(shape, dtype), requires_grad)

    @staticmethod
    def uniform(low, high, shape, requires_grad=True):
        arr = np.random.uniform(low, high, shape).astype(np.float32)
        return BareTensor(arr, requires_grad)

    @staticmethod
    def from_numpy(a, requires_grad=True):
        return BareTensor(np.asarray(a, dtype=np.float32), requires_grad)

    def numpy(self):
        return np.asarray(self.data)

    def copy(self, requires_grad=True):
        return BareTensor(self.data.copy(), requires_grad)


@BareTensor.register_op()
class neg(Function):
    def forward(ctx, a):
        return _t(-a.data)

    def backward(ctx, g):
        return _t(-g.data)


@BareTensor.register_op()
class exp(Function):
    def forward(ctx, a):
        y = np.exp(a.data)
        ctx.save_for_backward(y)
        return _t(y)

    def backward(ctx, g):
        (y,) = ctx.get_saved_tensors()
        return _t(g.data * y)


@BareTensor.register_op()
class add(Function):
    def forward(ctx, a, b):
        ctx.save_for_backward(isinstance(b, AbstractTensor))
        return _t(a.data + _raw(b))

    def backward(ctx, g):
        (b_is_tensor,) = ctx.get_saved_tensors()
        return (_t(g.data), _t(g.data)) if b_is_tensor else _t(g.data)


@BareTensor.register_op()
class mul(Function):
    def forward(ctx, a, b):
        ctx.save_for_backward(a.data, _raw(b), isinstance(b, AbstractTensor))
        return _t(a.data * _raw(b))

    def backward(ctx, g):
        x, y, b_is_tensor = ctx.get_saved_tensors()
        return (_t(g.data * y), _t(g.data * x)) if b_is_tensor else _t(g.data * y)


@BareTensor.register_op()
class pow(Function):
    def forward(ctx, a, b):
        ctx.save_for_backward(a.data, _raw(b))
        return _t(a.data ** _raw(b))

    def backward(ctx, g):
        x, y = ctx.get_saved_tensors()
        return _t(g.data * y * x ** (y - 1.0))


def _restore(arr, axis, keepdims, rank):
    if keepdims or axis is None:
        return arr
    axes = axis if isinstance(axis, tuple) else (axis,)
    return np.expand_dims(arr, tuple(a % rank for a in axes))


@BareTensor.register_op()
class sum(Function):
    def forward(ctx, a, axis=None, keepdims: bool = False):
        ctx.save_for_backward(a.shape, axis, keepdims)
        return _t(np.sum(a.data, axis=axis, keepdims=keepdims))

    def backward(ctx, g):
        shape, axis, keepdims = ctx.get_saved_tensors()
        go = _restore(g.data, axis, keepdims, len(shape))
        return _t(np.broadcast_to(go, shape).copy())


def _minmax(name, np_fn):
    class Op(Function):
        def forward(ctx, a, axis=None, keepdims: bool = False):
            y = np_fn(a.data, axis=axis, keepdims=keepdims)
            ctx.save_for_backward(a.data, y, axis, keepdims)
            return _t(y)

        def backward(ctx, g):
            x, y, axis, keepdims = ctx.get_saved_tensors()
            mask = x == _restore(np.asarray(y), axis, keepdims, x.ndim)
            return _t(mask * _restore(g.data, axis, keepdims, x.ndim))

    Op.__name__ = name
    BareTensor.register_op(name, Op)


_minmax("max", np.max)
_minmax("min", np.min)


@BareTensor.register_op()
class reshape(Function):
    def forward(ctx, a, *shape):
        ctx.save_for_backward(a.shape)
        return _t(a.data.reshape(shape))

    def backward(ctx, g):
        (shape,) = ctx.get_saved_tensors()
        return _t(g.data.reshape(shape))


@BareTensor.register_op()
@BareTensor.register_op("T")
class transpose(Function):
    def forward(ctx, a, *axes):
        axes = axes if len(axes) > 0 else tuple(reversed(range(a.ndim)))
        ctx.save_for_backward(axes)
        return _t(np.transpose(a.data, axes))

    def backward(ctx, g):
        (axes,) = ctx.get_saved_tensors()
        return _t(np.transpose(g.data, np.argsort(axes)))


@BareTensor.register_op("__getitem__")
class getitem(Function):
    def forward(ctx, a, idx):
        ctx.save_for_backward(a.shape, idx)
        return _t(a.data[idx])

    def backward(ctx, g):
        shape, idx = ctx.get_saved_tensors()
        out = np.zeros(shape, np.float32)
        np.add.at(out, idx, g.data)
        return _t(out)


@BareTensor.register_op("__setitem__")
class setitem(Function):
    def forward(ctx, a, idx, val):
        a.data[idx] = _raw(val)
        return a


@BareTensor.register_op()
class iadd(Function):
    def forward(ctx, a, b):
        a.data.__iadd__(_raw(b))
        return a


@BareTensor.register_op()
class fill(Function):
    def forward(ctx, a, val):
        a.data.fill(val)
        return a


# ---------------------------------------------------------------------------
# forward parity vs numpy closed forms
# ---------------------------------------------------------------------------
def _x(shape=(3, 4), scale=2.0, seed=0):
    return np.random.default_rng(seed).uniform(-scale, scale, shape).astype(np.float32)


def test_bare_sigmoid_forward():
    x = _x()
    got = BareTensor.from_numpy(x).sigmoid().numpy()
    np.testing.assert_allclose(got, 1 / (1 + np.exp(-x)), rtol=1e-5, atol=1e-5)


def test_bare_tanh_forward():
    # THE regression test: the reference composite computed tanh(x/2)
    x = _x(scale=3.0)
    got = BareTensor.from_numpy(x).tanh().numpy()
    np.testing.assert_allclose(got, np.tanh(x), rtol=1e-5, atol=1e-5)


def test_bare_softmax_forward():
    x = _x((4, 5))
    e = np.exp(x - x.max(-1, keepdims=True))
    got = BareTensor.from_numpy(x).softmax(axis=-1).numpy()
    np.testing.assert_allclose(got, e / e.sum(-1, keepdims=True), rtol=1e-5, atol=1e-5)


def test_bare_gelu_forward():
    x = _x(scale=3.0)
    expect = 0.5 * x * (1 + np.tanh(0.7978845608028654 * (x + 0.044715 * x**3)))
    got = BareTensor.from_numpy(x).gelu().numpy()
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("axis,keepdims", [(None, False), (0, False), (-1, True), ((0, 1), False)])
def test_bare_mean_forward(axis, keepdims):
    x = _x((3, 4))
    got = BareTensor.from_numpy(x).mean(axis=axis, keepdims=keepdims).numpy()
    np.testing.assert_allclose(got, x.mean(axis=axis, keepdims=keepdims), rtol=1e-5, atol=1e-5)


def test_bare_pools_forward():
    x = _x((2, 1, 6, 6))
    win = x.reshape(2, 1, 3, 2, 3, 2).transpose(0, 1, 2, 4, 3, 5).reshape(2, 1, 3, 3, 4)
    np.testing.assert_allclose(
        BareTensor.from_numpy(x).max_pool().numpy(), win.max(-1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        BareTensor.from_numpy(x).mean_pool().numpy(), win.mean(-1), rtol=1e-5, atol=1e-5)


def test_bare_arith_composites():
    a, b = _x(seed=1), _x(seed=2) + 3.0
    ta, tb = BareTensor.from_numpy(a), BareTensor.from_numpy(b)
    np.testing.assert_allclose((ta - tb).numpy(), a - b, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose((ta / tb).numpy(), a / b, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose((1.0 - tb).numpy(), 1.0 - b, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose((1.0 / tb).numpy(), 1.0 / b, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# gradients through the composite graphs (numerical vs tape)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("name", ["sigmoid", "tanh", "gelu"])
def test_bare_activation_grads(name):
    x = BareTensor.from_numpy(_x((2, 3), scale=1.5, seed=3))
    assert_gradcheck(f=lambda t: getattr(t, name)(), x=x)


def test_bare_softmax_grad():
    x = BareTensor.from_numpy(_x((2, 4), seed=4))
    assert_gradcheck(f=lambda t: t.softmax(axis=-1), x=x)


def test_bare_mean_grad():
    x = BareTensor.from_numpy(_x((2, 3), seed=5))
    assert_gradcheck(f=lambda t: t.mean(axis=-1), x=x)


def test_bare_pool_grads():
    x = BareTensor.from_numpy(_x((1, 1, 4, 4), seed=6))
    assert_gradcheck(f=lambda t: t.mean_pool(), x=x)
    # max_pool ties are measure-zero with continuous random input
    assert_gradcheck(f=lambda t: t.max_pool(), x=x)
