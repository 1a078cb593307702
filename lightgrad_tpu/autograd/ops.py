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
def max_pool2d(t, kernel: tuple = (2, 2), stride=None, padding: int = 0):
    """Torch-semantics max pooling over the trailing (H, W) dims: overlapping
    windows (stride < kernel) and padding supported -- unlike ``max_pool``,
    whose reshape trick needs stride == kernel.  Windows are gathered as
    ``kh*kw`` shifted strided slices stacked on a new axis, so every backend
    inherits the backward from getitem/concat/max (the reference has only the
    non-overlapping pool, reference ops.py:100-133; overlapping pooling is
    needed for torchvision-faithful ResNet stems)."""
    kh, kw = kernel if isinstance(kernel, tuple) else (kernel, kernel)
    sh, sw = (stride if isinstance(stride, tuple) else (stride, stride)) \
        if stride is not None else (kh, kw)
    if padding:
        # pad with -inf so padded cells never win the max
        t = t.pad(padding, dims=(-2, -1), value=-1e30)
    h, w = t.shape[-2:]
    oh, ow = (h - kh) // sh + 1, (w - kw) // sw + 1
    lead = tuple(slice(None) for _ in t.shape[:-2])
    slices = []
    for i in range(kh):
        for j in range(kw):
            s = t[lead + (slice(i, i + (oh - 1) * sh + 1, sh),
                          slice(j, j + (ow - 1) * sw + 1, sw))]
            slices.append(s.reshape(1, *s.shape))
    if len(slices) == 1:
        return slices[0].max(axis=0, keepdims=False)
    return slices[0].concat(*slices[1:], axis=0).max(axis=0, keepdims=False)


@composite
def min_pool(t, kernel: tuple = (2, 2)):
    return t.pool(kernel=kernel).min(axis=0, keepdims=False)


@composite
def mean_pool(t, kernel: tuple = (2, 2)):
    return t.pool(kernel=kernel).mean(axis=0, keepdims=False)


@composite
def conv_transpose(t, w, strides: int = 1, dilation: int = 1, groups: int = 1,
                   output_padding: int = 0, pad: int = 0):
    """Transposed (fractionally-strided) convolution, 1-D or 2-D.

    Torch semantics and weight layout ``(Cin, Cout/g, *K)``: output spatial
    = ``(s-1)*stride - 2*pad + (k-1)*dilation + 1 + output_padding``.  Built
    entirely from existing primitives -- zero-dilate the input (reshape +
    pad + reshape), flip/transpose the kernel, stride-1 conv -- so every
    backend gets the backward from the tape for free (the reference has no
    transposed conv at all; extension for decoder architectures,
    ROADMAP 'Capability')."""
    n = w.ndim - 2
    assert n in (1, 2), f"conv_transpose supports 1-D/2-D, got {n}-D"
    st, dl = strides, dilation
    assert isinstance(st, int) and isinstance(dl, int), \
        "conv_transpose takes scalar stride/dilation"
    k_eff = tuple((k - 1) * dl + 1 for k in w.shape[2:])
    assert all(0 <= pad <= ke - 1 for ke in k_eff), \
        f"pad must be in [0, k_eff-1], got {pad} vs {k_eff}"
    b, cin = t.shape[0], t.shape[1]
    spatial = t.shape[2:]

    if st > 1:
        # zero-dilate: x[..., i] -> position i*st.  Split each spatial dim
        # into (S, 1), grow the singleton to st with a right zero-pad, then
        # flatten and crop the trailing st-1 zeros.
        if n == 2:
            sh, sw = spatial
            y = t.reshape(b, cin, sh, 1, sw, 1)
            y = y.pad((0, st - 1), dims=(-1,))      # (b,c,sh,1,sw,st)
            y = y.transpose(0, 1, 2, 5, 4, 3)       # (b,c,sh,st,sw,1)
            y = y.pad((0, st - 1), dims=(-1,))      # (b,c,sh,st,sw,st)
            y = y.reshape(b, cin, sh * st, sw * st)
            t = y[:, :, : (sh - 1) * st + 1, : (sw - 1) * st + 1]
        else:
            (sw,) = spatial
            y = t.reshape(b, cin, sw, 1).pad((0, st - 1), dims=(-1,))
            t = y.reshape(b, cin, sw * st)[:, :, : (sw - 1) * st + 1]

    lo = tuple(ke - 1 - pad for ke in k_eff)
    hi = tuple(ke - 1 - pad + output_padding for ke in k_eff)
    assert len(set(lo)) == 1 and len(set(hi)) == 1, "anisotropic kernels need equal k_eff"
    if lo[0] > 0 or hi[0] > 0:
        t = t.pad((lo[0], hi[0]), dims=tuple(range(-n, 0)))

    # weight (Cin, Cout/g, *K) -> flipped, per-group-transposed (Cout, Cin/g, *K)
    flip = (slice(None), slice(None)) + (slice(None, None, -1),) * n
    wf = w[flip]
    og = w.shape[1]
    wf = wf.reshape(groups, cin // groups, og, *w.shape[2:])
    wf = wf.transpose(0, 2, 1, *range(3, 3 + n))
    wf = wf.reshape(groups * og, cin // groups, *w.shape[2:])
    return t.conv(wf, strides=1, dilation=dl, groups=groups)


AbstractTensor.register_method("pool", pool)
AbstractTensor.register_method("max_pool", max_pool)
AbstractTensor.register_method("max_pool2d", max_pool2d)
AbstractTensor.register_method("min_pool", min_pool)
AbstractTensor.register_method("mean_pool", mean_pool)
AbstractTensor.register_method("conv_transpose", conv_transpose)
