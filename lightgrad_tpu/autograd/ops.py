"""Device-agnostic derived ops, built from backend primitives.

Covers the reference's non-first-class op layer
(``/root/reference/lightgrad/autograd/ops.py``): operator dunders, the
``sub/div/rsub/rdiv`` arithmetic composites, ``sigmoid/tanh/softmax`` activation
fallbacks (backends override these with fused kernels), the ``mean`` reduction
(with the reference's rescale bug fixed: the scale uses the *element-count
ratio* computed from shapes, reference ops.py:71-75 multiplied by the summed
tensor's numel ratio which is only correct because it equals the same value --
we compute ``sum / reduced_count`` explicitly), ``pad``, and the
``pool/max_pool/min_pool/mean_pool`` family.

Composites record their primitive sub-ops directly on the tape (see
``function.composite``); backends are free to override any of these with a
single fused kernel via ``register_op`` on the backend class.
"""

from functools import reduce as _reduce

from .tensor import AbstractTensor
from .function import Function, composite
from .grads import Gradients

# ---------------------------------------------------------------------------
# operator dunders -> registered methods
# ---------------------------------------------------------------------------
AbstractTensor.__neg__ = lambda t: t.neg()
AbstractTensor.__pow__ = lambda a, b: a.pow(b)
AbstractTensor.__add__ = lambda a, b: a.add(b)
AbstractTensor.__radd__ = lambda a, b: a.add(b)
AbstractTensor.__mul__ = lambda a, b: a.mul(b)
AbstractTensor.__rmul__ = lambda a, b: a.mul(b)
AbstractTensor.__sub__ = lambda a, b: a.sub(b)
AbstractTensor.__truediv__ = lambda a, b: a.div(b)
AbstractTensor.__rsub__ = lambda b, a: b.rsub(a)
AbstractTensor.__rtruediv__ = lambda b, a: b.rdiv(a)
AbstractTensor.__matmul__ = lambda a, b: a.dot(b)
# in-place dunders route to the backend's true in-place ops (iadd/isub/...)
AbstractTensor.__iadd__ = lambda a, b: a.iadd(b)
AbstractTensor.__isub__ = lambda a, b: a.isub(b)
AbstractTensor.__imul__ = lambda a, b: a.imul(b)
AbstractTensor.__itruediv__ = lambda a, b: a.idiv(b)


# ---------------------------------------------------------------------------
# arithmetic composites (backends may override with fused primitives)
# ---------------------------------------------------------------------------
@composite
def sub(a, b):
    return a + (-b)


@composite
def div(a, b):
    return a * (b ** -1.0)


@composite
def rsub(b, a):
    """``a - b`` with ``a`` a scalar/array on the left."""
    return (-b) + a


@composite
def rdiv(b, a):
    """``a / b`` with ``a`` a scalar/array on the left."""
    return (b ** -1.0) * a


AbstractTensor.register_method("sub", sub)
AbstractTensor.register_method("div", div)
AbstractTensor.register_method("rsub", rsub)
AbstractTensor.register_method("rdiv", rdiv)


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------
@composite
def sigmoid(t):
    return 1.0 / (1.0 + t.neg().exp())


@composite
def tanh(t):
    # tanh(x) = 2*sigmoid(2x) - 1.  (The reference's composite,
    # lightgrad/autograd/ops.py:58-60, drops the inner 2x -- computing
    # tanh(x/2) -- a bug masked there and here by backend overrides; the
    # composite itself must be correct for backends that inherit it.)
    return (t * 2.0).sigmoid() * 2.0 - 1.0


@composite
def softmax(t, axis: int = -1):
    exps = (t - t.max(axis=axis, keepdims=True)).exp()
    return exps / exps.sum(axis=axis, keepdims=True)


@composite
def gelu(t):
    """tanh-approximated GELU (the BERT variant, reference examples/bert.py:12)."""
    return t * ((t * 0.7978845608028654 * (1.0 + 0.044715 * t * t)).tanh() + 1.0) * 0.5


AbstractTensor.register_method("sigmoid", sigmoid)
AbstractTensor.register_method("tanh", tanh)
AbstractTensor.register_method("softmax", softmax)
AbstractTensor.register_method("gelu", gelu)


# ---------------------------------------------------------------------------
# reductions
# ---------------------------------------------------------------------------
@composite
def mean(t, axis=None, keepdims: bool = False):
    s = t.sum(axis=axis, keepdims=keepdims)
    count = t.numel() / max(s.numel(), 1)
    return s * (1.0 / count)


AbstractTensor.register_method("mean", mean)


# ---------------------------------------------------------------------------
# padding (backends override with a native pad, e.g. XLA pad on TPU)
# ---------------------------------------------------------------------------
@AbstractTensor.register_op()
class pad(Function):
    """Zero-(or value-)pad the trailing ``dims`` by ``padding`` on both sides."""

    def forward(ctx, t, padding, dims: tuple = (-2, -1), value: float = 0.0):
        n = len(dims)
        lo, hi = padding if isinstance(padding, tuple) else (padding, padding)
        ctx.save_for_backward(lo, hi, n)
        out_shape = t.shape[:-n] + tuple(lo + hi + s for s in t.shape[-n:])
        out = type(t).empty(out_shape, dtype=t.dtype).fill(value).detach()
        idx = tuple(slice(None) for _ in t.shape[:-n]) + tuple(
            slice(lo, lo + s) for s in t.shape[-n:]
        )
        out[idx] = t
        return out

    def backward(ctx, out_grad):
        lo, hi, n = ctx.get_saved_tensors()
        idx = tuple(slice(None) for _ in out_grad.shape[:-n]) + tuple(
            slice(lo, s - hi) for s in out_grad.shape[-n:]
        )
        return out_grad[idx]


# ---------------------------------------------------------------------------
# pooling: window extraction via reshape/transpose (XLA-friendly: pure
# data-movement ops the compiler folds into layouts), then reduce over axis 0.
# Unlike the reference's first-class pool Function (ops.py:100-133) this is a
# composite -- cropping/reshape/transpose are each differentiable primitives,
# so the tape provides the backward for free.
# ---------------------------------------------------------------------------
@composite
def pool(t, kernel: tuple = (2, 2)):
    n = len(kernel)
    lead, spatial = t.shape[:-n], t.shape[-n:]
    out_sp = tuple(d // k for d, k in zip(spatial, kernel))
    # crop spatial dims to whole windows
    cropped = tuple(o * k for o, k in zip(out_sp, kernel))
    if cropped != spatial:
        idx = tuple(slice(None) for _ in lead) + tuple(slice(c) for c in cropped)
        t = t[idx]
    # split each spatial dim into (blocks, kernel)
    split_shape = lead + sum(((o, k) for o, k in zip(out_sp, kernel)), ())
    t = t.reshape(*split_shape)
    # move kernel axes to the front, keep (lead, out_spatial) order behind
    m = len(lead)
    kernel_axes = tuple(m + 2 * i + 1 for i in range(n))
    lead_axes = tuple(range(m))
    block_axes = tuple(m + 2 * i for i in range(n))
    t = t.transpose(*kernel_axes, *lead_axes, *block_axes)
    flat_k = _reduce(lambda a, b: a * b, kernel, 1)
    return t.reshape(flat_k, *lead, *out_sp)


@composite
def max_pool(t, kernel: tuple = (2, 2)):
    return t.pool(kernel=kernel).max(axis=0, keepdims=False)


@composite
def min_pool(t, kernel: tuple = (2, 2)):
    return t.pool(kernel=kernel).min(axis=0, keepdims=False)


@composite
def mean_pool(t, kernel: tuple = (2, 2)):
    return t.pool(kernel=kernel).mean(axis=0, keepdims=False)


AbstractTensor.register_method("pool", pool)
AbstractTensor.register_method("max_pool", max_pool)
AbstractTensor.register_method("min_pool", min_pool)
AbstractTensor.register_method("mean_pool", mean_pool)
