"""TPU op set: Function wrappers over the Pallas/XLA kernel layer.

Capability parity with the union of the reference's CPU and OpenCL op sets
(``/root/reference/lightgrad/autograd/{cpu,opencl}/ops.py``), with the
reference's gaps closed: conv has a full backward (OpenCL raised,
opencl/ops.py:403-408), sum has a backward (cpu/ops.py:293 TODO), and getitem
supports advanced integer indexing (opencl TODO at ops.py:309) -- which is
what removes the reference BERT's embedding CPU-round-trip hack (bert.py:21).

Binary backwards are fused: one elementwise kernel emits both input gradients
(the reference's best perf idea, opencl/ops.py:80-83, kept as a multi-output
Pallas kernel).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..tensor import AbstractTensor
from ..function import Function
from ..einsum_spec import parse_spec as parse_einsum_spec, bwd_plan as einsum_bwd_plan
from .tensor import TpuTensor, _note
from ...ops.elementwise import ew
from ...ops.matmul import matmul as kmatmul
from ...ops.reduce import reduce as kreduce
from ...ops.conv import conv_fwd as kconv_fwd, conv_bwd as kconv_bwd


def _t(arr):
    return TpuTensor(_note(arr), requires_grad=False)


def _raw(x):
    return x.data if isinstance(x, AbstractTensor) else x


def _scalar(b, like):
    """Promote a python scalar to a jnp scalar of the operand's dtype."""
    if isinstance(b, jax.Array):
        return b
    dt = like.dtype if jnp.issubdtype(like.dtype, jnp.floating) else jnp.result_type(like.dtype, np.asarray(b).dtype)
    return jnp.asarray(b, dtype=dt)


def _unwrap_index(idx):
    if isinstance(idx, AbstractTensor):
        return idx.data
    if isinstance(idx, tuple):
        return tuple(_unwrap_index(i) for i in idx)
    return idx


# ---------------------------------------------------------------------------
# elementwise kernels bodies (module-level for stable jit identity)
# ---------------------------------------------------------------------------
def _f_neg(x): return -x
def _b_neg(g): return -g
def _f_sin(x): return jnp.sin(x)
def _b_sin(g, x): return g * jnp.cos(x)
def _f_cos(x): return jnp.cos(x)
def _b_cos(g, x): return -g * jnp.sin(x)
def _f_exp(x): return jnp.exp(x)
def _b_exp(g, y): return g * y
def _f_log(x): return jnp.log(x)
def _b_log(g, x): return g / x
def _f_sigmoid(x): return jax.nn.sigmoid(x)
def _b_sigmoid(g, y): return g * y * (1.0 - y)
def _f_tanh(x): return jnp.tanh(x)
def _b_tanh(g, y): return g * (1.0 - y * y)
def _f_relu(x): return jnp.maximum(x, 0)
def _b_relu(g, x): return g * (x > 0).astype(g.dtype)
def _f_gelu(x):
    # tanh-approximated GELU (BERT variant)
    return 0.5 * x * (1.0 + jnp.tanh(0.7978845608028654 * (x + 0.044715 * x * x * x)))
def _f_gelu_exact(x):
    # exact erf GELU (torch's default; HF "gelu"): x/2 * (1 + erf(x/sqrt2))
    return 0.5 * x * (1.0 + jax.lax.erf(x * 0.7071067811865476))
def _b_gelu_exact(g, x):
    cdf = 0.5 * (1.0 + jax.lax.erf(x * 0.7071067811865476))
    pdf = 0.3989422804014327 * jnp.exp(-0.5 * x * x)
    return g * (cdf + x * pdf)
def _b_gelu(g, x):
    u = 0.7978845608028654 * (x + 0.044715 * x * x * x)
    t = jnp.tanh(u)
    du = 0.7978845608028654 * (1.0 + 3 * 0.044715 * x * x)
    return g * (0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * du)

def _f_add(a, b): return a + b
def _b2_add(g, a, b): return g, g
def _b1_add(g): return g
def _f_sub(a, b): return a - b
def _b2_sub(g, a, b): return g, -g
def _f_mul(a, b): return a * b
def _b2_mul(g, a, b): return g * b, g * a
def _b1_mul(g, b): return g * b
def _f_div(a, b): return a / b
def _b2_div(g, a, b): return g / b, -g * a / (b * b)
def _b1_div(g, b): return g / b
def _f_pow(a, b): return a ** b
def _b2_pow(g, a, b, y): return g * b * a ** (b - 1.0), g * y * jnp.log(a)
def _b1_pow(g, a, b): return g * b * a ** (b - 1.0)

def _b_minmax(g, x, y): return g * (x == y).astype(g.dtype)


# ---------------------------------------------------------------------------
# unary op factory
# ---------------------------------------------------------------------------
def _unary(name, fwd, bwd, save):
    class Op(Function):
        def forward(ctx, a):
            y = ew(fwd, a.data)
            if save == "x":
                ctx.save_for_backward(a.data)
            elif save == "y":
                ctx.save_for_backward(y)
            return _t(y)

        def backward(ctx, g):
            if save is None:
                return _t(ew(bwd, g.data))
            (res,) = ctx.get_saved_tensors()
            return _t(ew(bwd, g.data, res))

    Op.__name__ = name
    TpuTensor.register_op(name, Op, overwrite=True)
    return Op


_unary("neg", _f_neg, _b_neg, None)
_unary("sin", _f_sin, _b_sin, "x")
_unary("cos", _f_cos, _b_cos, "x")
_unary("exp", _f_exp, _b_exp, "y")
_unary("log", _f_log, _b_log, "x")
_unary("sigmoid", _f_sigmoid, _b_sigmoid, "y")
_unary("tanh", _f_tanh, _b_tanh, "y")
_unary("relu", _f_relu, _b_relu, "x")
_unary("gelu", _f_gelu, _b_gelu, "x")
_unary("gelu_exact", _f_gelu_exact, _b_gelu_exact, "x")


# ---------------------------------------------------------------------------
# binary ops (fused two-gradient backward when both operands are tensors)
# ---------------------------------------------------------------------------
def _binary(name, fwd, bwd2, bwd1, save_y=False):
    class Op(Function):
        def forward(ctx, a, b):
            both = isinstance(b, AbstractTensor)
            braw = b.data if both else _scalar(b, a.data)
            y = ew(fwd, a.data, braw)
            ctx.save_for_backward(both, a.data, braw, y if save_y else None)
            return _t(y)

        def backward(ctx, g):
            both, araw, braw, y = ctx.get_saved_tensors()
            if both:
                args = (g.data, araw, braw) + ((y,) if save_y else ())
                ga, gb = ew(bwd2, *args, n_out=2)
                return _t(ga), _t(gb)
            if name == "add" or name == "sub":
                return (_t(ew(bwd1, g.data)),)
            if name == "pow":
                return (_t(ew(bwd1, g.data, araw, braw)),)
            return (_t(ew(bwd1, g.data, braw)),)

    Op.__name__ = name
    TpuTensor.register_op(name, Op, overwrite=True)
    return Op


_binary("add", _f_add, _b2_add, _b1_add)
_binary("sub", _f_sub, _b2_sub, _b1_add)
_binary("mul", _f_mul, _b2_mul, _b1_mul)
_binary("div", _f_div, _b2_div, _b1_div)
_binary("pow", _f_pow, _b2_pow, _b1_pow, save_y=True)


# ---------------------------------------------------------------------------
# in-place ops (buffer swap via _set_data; used under no_grad)
# ---------------------------------------------------------------------------
def _inplace(name, fwd):
    class Op(Function):
        def forward(ctx, a, b):
            braw = b.data if isinstance(b, AbstractTensor) else _scalar(b, a.data)
            res = ew(fwd, a.data, braw)
            if res.dtype != a.data.dtype:
                # in-place ops must never change the target's dtype (e.g.
                # bf16 param += f32 grad would silently promote the param)
                res = res.astype(a.data.dtype)
            return a._set_data(_note(res))

    Op.__name__ = name
    TpuTensor.register_op(name, Op, overwrite=True)
    return Op


_inplace("iadd", _f_add)
_inplace("isub", _f_sub)
_inplace("imul", _f_mul)
_inplace("idiv", _f_div)


@TpuTensor.register_op()
class fill(Function):
    def forward(ctx, a, val):
        return a._set_data(_note(jnp.full(a.shape, val, dtype=a.dtype)))


# ---------------------------------------------------------------------------
# movement ops
# ---------------------------------------------------------------------------
@TpuTensor.register_op()
@TpuTensor.register_op("T")
class transpose(Function):
    def forward(ctx, a, *axes):
        axes = axes if len(axes) > 0 else tuple(reversed(range(a.ndim)))
        ctx.save_for_backward(axes)
        return _t(jnp.transpose(a.data, axes))

    def backward(ctx, g):
        (axes,) = ctx.get_saved_tensors()
        return _t(jnp.transpose(g.data, np.argsort(axes)))


@TpuTensor.register_op()
class reshape(Function):
    def forward(ctx, a, *shape):
        ctx.save_for_backward(a.shape)
        return _t(jnp.reshape(a.data, shape))

    def backward(ctx, g):
        (shape,) = ctx.get_saved_tensors()
        return _t(jnp.reshape(g.data, shape))


@TpuTensor.register_op()
class contiguous(Function):
    def forward(ctx, a):
        return _t(a.data)

    def backward(ctx, g):
        return g


@TpuTensor.register_op("__getitem__")
class getitem(Function):
    def forward(ctx, a, idx):
        idx = _unwrap_index(idx)
        ctx.save_for_backward(a.shape, a.dtype, idx)
        return _t(a.data[idx])

    def backward(ctx, g):
        shape, dtype, idx = ctx.get_saved_tensors()
        # cast explicitly: scattering an f32 grad into a bf16 zeros buffer
        # relies on deprecated implicit demotion
        out = jnp.zeros(shape, dtype=dtype).at[idx].add(g.data.astype(dtype))
        return _t(out)


@TpuTensor.register_op("__setitem__")
class setitem(Function):
    def forward(ctx, a, idx, val):
        return a._set_data(_note(a.data.at[_unwrap_index(idx)].set(_raw(val))))


@TpuTensor.register_op()
class narrow(Function):
    """Dynamic-start slice: ``length`` elements along ``axis`` from ``start``.

    ``start`` may be a (0-d integer) tensor, so a data-loader batch index can
    be *traced* -- one compiled program serves every batch offset (static
    getitem slices would recompile per offset).
    """

    def forward(ctx, a, start, length: int, axis: int = 0):
        s = start.data if isinstance(start, AbstractTensor) else start
        ctx.save_for_backward(a.shape, a.dtype, s, axis)
        return _t(jax.lax.dynamic_slice_in_dim(a.data, s, length, axis))

    def backward(ctx, g):
        shape, dtype, s, axis = ctx.get_saved_tensors()
        zeros = jnp.zeros(shape, dtype=dtype)
        return (_t(jax.lax.dynamic_update_slice_in_dim(zeros, g.data, s, axis)),)


@TpuTensor.register_op()
class concat(Function):
    """Concatenate tensors along ``axis`` (backward slices the gradient)."""

    def forward(ctx, *ts, axis: int = -1):
        sizes = [t.shape[axis] for t in ts]
        ctx.save_for_backward(axis, sizes)
        return _t(jnp.concatenate([t.data for t in ts], axis=axis))

    def backward(ctx, g):
        axis, sizes = ctx.get_saved_tensors()
        outs, off = [], 0
        for s in sizes:
            outs.append(_t(jax.lax.slice_in_dim(g.data, off, off + s, axis=axis)))
            off += s
        return tuple(outs)


@TpuTensor.register_op(overwrite=True)
class pad(Function):
    """Native XLA pad (overrides the generic zeros+setitem fallback)."""

    def forward(ctx, t, padding, dims: tuple = (-2, -1), value: float = 0.0):
        n = len(dims)
        lo, hi = padding if isinstance(padding, tuple) else (padding, padding)
        ctx.save_for_backward(lo, hi, n)
        widths = [(0, 0)] * (t.ndim - n) + [(lo, hi)] * n
        return _t(jnp.pad(t.data, widths, constant_values=value))

    def backward(ctx, g):
        lo, hi, n = ctx.get_saved_tensors()
        idx = tuple(slice(None) for _ in range(g.ndim - n)) + tuple(
            slice(lo, s - hi) for s in g.shape[-n:]
        )
        return _t(g.data[idx])


# ---------------------------------------------------------------------------
# matmul
# ---------------------------------------------------------------------------
@TpuTensor.register_op()
class dot(Function):
    def forward(ctx, a, b):
        ctx.save_for_backward(a.data, b.data)
        return _t(kmatmul(a.data, b.data))

    def backward(ctx, g):
        araw, braw = ctx.get_saved_tensors()
        ga = kmatmul(g.data, jnp.swapaxes(braw, -1, -2))
        gb = kmatmul(jnp.swapaxes(araw, -1, -2), g.data)
        return _t(ga), _t(gb)


@TpuTensor.register_op()
class einsum(Function):
    """General tensor contraction: ``a.einsum("ab,bc->ac", b)``.

    Forward is one ``jnp.einsum`` (XLA lowers it to MXU dot_generals);
    backward is one einsum per differentiable operand, planned by
    ``autograd/einsum_spec.py``.  See that module for the supported grammar.
    """

    def forward(ctx, a, spec: str, *rest):
        datas = (a.data,) + tuple(o.data for o in rest)
        terms, out = parse_einsum_spec(spec, len(datas))
        ctx.save_for_backward(spec, terms, out, datas)
        return _t(jnp.einsum(spec, *datas))

    def backward(ctx, g):
        spec, terms, out, datas = ctx.get_saved_tensors()
        grads = []
        for i, parent in enumerate(ctx.parents):
            if not parent.requires_grad:
                grads.append(None)
                continue
            sub, kept, term = einsum_bwd_plan(terms, out, i)
            others = [d for j, d in enumerate(datas) if j != i]
            gi = jnp.einsum(sub, g.data, *others)
            for pos, c in enumerate(term):  # re-insert forward-summed axes
                if c not in kept:
                    gi = jnp.expand_dims(gi, pos)
            gi = jnp.broadcast_to(gi, datas[i].shape)
            grads.append(_t(gi.astype(datas[i].dtype)))
        return tuple(grads)


# ---------------------------------------------------------------------------
# reductions
# ---------------------------------------------------------------------------
def _restore(arr, axis, keepdims, rank):
    if keepdims or axis is None:
        return arr
    axes = axis if isinstance(axis, tuple) else (axis,)
    axes = tuple(a % rank for a in axes)
    return jnp.expand_dims(arr, axes)


@TpuTensor.register_op("sum")
class sum_(Function):
    def forward(ctx, a, axis=None, keepdims: bool = False):
        ctx.save_for_backward(a.shape, axis, keepdims)
        return _t(kreduce(a.data, "sum", axis=axis, keepdims=keepdims))

    def backward(ctx, g):
        shape, axis, keepdims = ctx.get_saved_tensors()
        go = _restore(g.data, axis, keepdims, len(shape))
        return _t(jnp.broadcast_to(go, shape))


def _minmax(name):
    class Op(Function):
        def forward(ctx, a, axis=None, keepdims: bool = False):
            y = kreduce(a.data, name, axis=axis, keepdims=keepdims)
            ctx.save_for_backward(a.data, y, axis, keepdims)
            return _t(y)

        def backward(ctx, g):
            x, y, axis, keepdims = ctx.get_saved_tensors()
            ye = _restore(y, axis, keepdims, x.ndim)
            ge = _restore(g.data, axis, keepdims, x.ndim)
            return _t(ew(_b_minmax, ge, x, ye))

    Op.__name__ = name
    TpuTensor.register_op(name, Op, overwrite=True)


_minmax("max")
_minmax("min")


@TpuTensor.register_op()
class nan_to_num(Function):
    """Replace nan/±inf (AMP grad sanitization; gradient passes through)."""

    def forward(ctx, a, nan: float = 0.0, posinf: float = 0.0, neginf: float = 0.0):
        return _t(jnp.nan_to_num(a.data, nan=nan, posinf=posinf, neginf=neginf))

    def backward(ctx, g):
        return _t(g.data)


@TpuTensor.register_op()
class cumsum(Function):
    """Inclusive cumulative sum along ``axis`` (reverse-cumsum backward).

    No reference counterpart; added so MoE routing can compute within-expert
    positions on device instead of a host-built (T,T) triangular matmul.
    """

    def forward(ctx, a, axis: int = -1):
        ctx.save_for_backward(axis)
        return _t(jnp.cumsum(a.data, axis=axis))

    def backward(ctx, g):
        (axis,) = ctx.get_saved_tensors()
        return _t(jnp.flip(jnp.cumsum(jnp.flip(g.data, axis), axis=axis), axis))


# ---------------------------------------------------------------------------
# int8 quantized linear (serving path; see lightgrad_tpu/quant.py)
# ---------------------------------------------------------------------------
@TpuTensor.register_op()
class quant_linear(Function):
    """Dynamic-activation int8xint8 linear: ``y = x @ Wq.T * (xs*ws) + b``.

    ``wq`` is an int8 (out, in) matrix with per-output-channel symmetric
    scales ``wscale`` (out,); activations are quantized per row (per token)
    at run time to int8, the matmul accumulates in int32 on the MXU
    (``preferred_element_type`` -- the v5e int8 path peaks at ~2x the bf16
    TFLOPs), and the float epilogue applies both scales.  Backward is the
    straight-through estimator through the dequantized weight (QAT-style);
    ``wq``/``wscale`` receive no gradient.  No reference counterpart
    (/root/reference has no quantization support).
    """

    def forward(ctx, x, wq, wscale, bias=None):
        xd = x.data
        wqd, wsd = _raw(wq), _raw(wscale)
        xf = xd.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        xs = jnp.maximum(absmax, 1e-8) * (1.0 / 127.0)  # (..., 1)
        xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wqd, (((xq.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * xs * wsd.astype(jnp.float32)
        if bias is not None:
            y = y + _raw(bias).astype(jnp.float32)
        ctx.save_for_backward(wqd, wsd, xd.dtype, bias is not None)
        return _t(y.astype(xd.dtype))

    def backward(ctx, g):
        wqd, wsd, xdt, has_bias = ctx.get_saved_tensors()
        wdeq = wqd.astype(jnp.float32) * wsd.astype(jnp.float32)[:, None]
        gx = jnp.matmul(g.data.astype(jnp.float32), wdeq)
        grads = (_t(gx.astype(xdt)), None, None)
        # bias grad reduces to (out,) via the core's _unbroadcast
        return grads + (_t(g.data),) if has_bias else grads


# ---------------------------------------------------------------------------
# convolution
# ---------------------------------------------------------------------------
@TpuTensor.register_op()
class conv(Function):
    def forward(ctx, x, w, strides=1, dilation=1, groups=1):
        ctx.save_for_backward(x.data, w.data, strides, dilation, groups)
        return _t(kconv_fwd(x.data, w.data, strides, dilation, groups))

    def backward(ctx, g):
        xd, wd, strides, dilation, groups = ctx.get_saved_tensors()
        gx, gw = kconv_bwd(g.data, xd, wd, strides, dilation, groups)
        return _t(gx), _t(gw)


# ---------------------------------------------------------------------------
# fused layer ops (pallas: ops/softmax.py, ops/layernorm.py, ops/attention.py)
# ---------------------------------------------------------------------------
from ...ops.softmax import softmax_fwd as ksoftmax_fwd, softmax_bwd as ksoftmax_bwd
from ...ops.layernorm import layernorm_fwd as kln_fwd, layernorm_bwd_dx as kln_bwd_dx
from ...ops.attention import (
    attention_fwd_res as kattn_fwd_res,
    attention_bwd as kattn_bwd,
)


@TpuTensor.register_op(overwrite=True)
class softmax(Function):
    """Fused numerically-stable softmax (overrides the 5-op composite)."""

    def forward(ctx, a, axis: int = -1):
        axis = axis % a.ndim
        last = a.ndim - 1
        ctx.save_for_backward(axis, last)
        x = a.data if axis == last else jnp.swapaxes(a.data, axis, last)
        y = ksoftmax_fwd(x)
        ctx.save_for_backward(y)
        return _t(y if axis == last else jnp.swapaxes(y, axis, last))

    def backward(ctx, g):
        axis, last, y = ctx.get_saved_tensors()
        gd = g.data if axis == last else jnp.swapaxes(g.data, axis, last)
        gx = ksoftmax_bwd(gd, y)
        return _t(gx if axis == last else jnp.swapaxes(gx, axis, last))


@TpuTensor.register_op()
class layernorm(Function):
    """Fused layer normalization over the trailing dims of ``w``'s shape."""

    def forward(ctx, x, w, b, eps: float = 1e-5):
        y, xhat, rstd = kln_fwd(x.data, w.data, b.data, eps)
        ctx.save_for_backward(x.shape, w.shape, w.data, xhat, rstd)
        return _t(y)

    def backward(ctx, g):
        x_shape, w_shape, wd, xhat, rstd = ctx.get_saved_tensors()
        r, c = xhat.shape
        g2 = g.data.reshape(r, c)
        dx = kln_bwd_dx(g2, wd, xhat, rstd).reshape(x_shape)
        dw = kreduce(ew(_f_mul, g2, xhat), "sum", axis=0).reshape(w_shape)
        db = kreduce(g2, "sum", axis=0).reshape(w_shape)
        return _t(dx), _t(dw), _t(db)


@TpuTensor.register_op()
class attention(Function):
    """Fused scaled-dot-product attention over (..., S, D) q/k/v.

    ``lengths``: optional per-example valid lengths (int tensor or array,
    one per leading-batch row after broadcasting over heads): right-padded
    keys are masked inside the flash kernel and padded query rows output
    zeros -- O(s) memory instead of a materialized (s, s) additive mask.
    The leading dims of q are (..., S, D); a (batch,) lengths vector is
    repeated over the remaining leading (head) dims automatically."""

    def forward(ctx, q, k, v, scale: float, causal: bool = False,
                lengths=None, window: int = 0):
        lens = None
        if lengths is not None:
            import numpy as _np

            lens = _raw(lengths)
            b_flat = 1
            for n in q.shape[:-2]:
                b_flat *= n
            if lens.shape[0] != b_flat:
                # (batch,) -> one entry per flattened (batch*heads) row
                lens = jnp.repeat(lens, b_flat // lens.shape[0])
        out, lse = kattn_fwd_res(q.data, k.data, v.data, scale,
                                 causal=causal, lengths=lens, window=window)
        ctx.save_for_backward(q.data, k.data, v.data, out, lse, scale,
                              causal, lens, window)
        return _t(out)

    def backward(ctx, g):
        (qd, kd, vd, out, lse, scale, causal, lens,
         window) = ctx.get_saved_tensors()
        dq, dk, dv = kattn_bwd(
            g.data, qd, kd, vd, scale, causal=causal, out=out, lse=lse,
            lengths=lens, window=window
        )
        return _t(dq), _t(dk), _t(dv)


@TpuTensor.register_op()
class ring_attention(Function):
    """Sequence-parallel exact attention: K/V rotate around the mesh's ``sp``
    ring (ppermute) instead of GSPMD all-gathering the full sequence.  The
    backward reuses the jax VJP of the shard_map'd ring (ppermute's transpose
    is the reverse rotation), so gradients are ring-communication-optimal
    too.  See parallel/ring_attention.py."""

    def forward(ctx, q, k, v, scale: float = 1.0, mesh=None, axis: str = "sp",
                causal: bool = False, batch_axis: str = None):
        from ...parallel.ring_attention import ring_attention_sharded

        assert mesh is not None, "ring_attention needs a mesh"
        out, vjp = jax.vjp(
            lambda a, b, c: ring_attention_sharded(
                a, b, c, scale, mesh, axis=axis, causal=causal,
                batch_axis=batch_axis),
            q.data, k.data, v.data,
        )
        ctx.save_for_backward(vjp)
        return _t(out)

    def backward(ctx, g):
        (vjp,) = ctx.get_saved_tensors()
        dq, dk, dv = vjp(g.data)
        return _t(dq), _t(dk), _t(dv)


@TpuTensor.register_op()
class astype(Function):
    """Dtype cast (differentiable: gradient casts back).

    Enables bf16 parameter/activation training: bf16 operands always take the
    MXU fast path (no multi-pass f32 emulation).
    """

    def forward(ctx, a, dtype):
        ctx.save_for_backward(a.dtype)
        return _t(a.data.astype(dtype))

    def backward(ctx, g):
        (dtype,) = ctx.get_saved_tensors()
        return _t(g.data.astype(dtype))


@TpuTensor.register_op()
class dropout(Function):
    """Inverted dropout. RNG comes from lightgrad_tpu.random's key tensor, so
    compiled steps (lightgrad_tpu.jit) draw fresh masks every call."""

    def forward(ctx, a, p: float = 0.5, training: bool = True):
        if not training or p <= 0.0:
            ctx.save_for_backward(None)
            return _t(a.data)
        from ... import random as _lgrandom  # lazy: avoids import cycle

        keep = jax.random.bernoulli(_lgrandom.next_key(), 1.0 - p, a.shape)
        mask = keep.astype(a.dtype) * (1.0 / (1.0 - p))
        ctx.save_for_backward(mask)
        return _t(ew(_f_mul, a.data, mask))

    def backward(ctx, g):
        (mask,) = ctx.get_saved_tensors()
        if mask is None:
            return g
        return _t(ew(_f_mul, g.data, mask))


def _f_eq(a, b): return (a == b).astype(a.dtype)
def _f_ge(a, b): return (a >= b).astype(a.dtype)
def _f_gt(a, b): return (a > b).astype(a.dtype)


def _register_compare(name, fwd):
    class Op(Function):
        """Elementwise comparison -> float mask (no gradient)."""

        def forward(ctx, a, b):
            braw = b.data if isinstance(b, AbstractTensor) else _scalar(b, a.data)
            return _t(ew(fwd, a.data, braw))

        def backward(ctx, g):
            return None  # no gradient through comparisons (any arity)

    Op.__name__ = name
    TpuTensor.register_op(name, Op, overwrite=True)


_register_compare("eq", _f_eq)
_register_compare("ge", _f_ge)
_register_compare("gt", _f_gt)


@TpuTensor.register_op()
class randn_like(Function):
    """Standard-normal draws with ``a``'s shape/dtype (x ``scale``).

    RNG comes from lightgrad_tpu.random's key tensor, like ``dropout``: a
    compiled step (lightgrad_tpu.jit) threads the mutated key through the
    program and draws FRESH noise every call -- the device-side noise source
    for diffusion training/sampling, noisy regularizers etc., with zero
    per-step host->device traffic.  No gradient (pure noise)."""

    def forward(ctx, a, scale: float = 1.0):
        from ... import random as _lgrandom  # lazy: avoids import cycle

        z = jax.random.normal(_lgrandom.next_key(), a.shape, a.data.dtype)
        return _t(z * scale if scale != 1.0 else z)

    def backward(ctx, g):
        return None


@TpuTensor.register_op()
class randint_like(Function):
    """Uniform int32 draws in [lo, hi) with ``a``'s shape (same traced-key
    freshness contract as ``randn_like``).  No gradient."""

    def forward(ctx, a, lo: int, hi: int):
        from ... import random as _lgrandom

        return _t(jax.random.randint(
            _lgrandom.next_key(), a.shape, lo, hi, jnp.int32))

    def backward(ctx, g):
        return None
