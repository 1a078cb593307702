"""N-D convolution as implicit GEMM on the MXU.

TPU-native successor of the reference's direct OpenCL conv kernel
(``/root/reference/lightgrad/autograd/opencl/kernels.py:510-625``, forward
only) and the CPU im2col path (``cpu/ops.py:298-356``).  On TPU the FLOPs
belong on the MXU, so the kernel strategy is patch-extraction (a static
unrolled set of strided slices -- pure data movement XLA folds into copies)
followed by the Pallas GEMM from ``matmul.py``.  Unlike the reference, the
full backward (input-grad col2im scatter-add + weight-grad GEMM) is provided.

Layouts follow the reference API: x ``(B, Cin, *S)``, w ``(Cout, Cin, *K)``,
output ``(B, Cout, *S_out)`` with 1/2/3-D spatial support.
"""

import functools
import itertools
from math import prod

import jax
import jax.numpy as jnp

from .runtime import resolve_mode
from .matmul import _matmul_impl

__all__ = ["conv_fwd", "conv_bwd"]


def _norm_strides(strides, n):
    return (strides,) * n if isinstance(strides, int) else tuple(strides)


def _out_spatial(spatial, ksize, strides):
    return tuple((s - k) // st + 1 for s, k, st in zip(spatial, ksize, strides))


def _patches(x, ksize, strides):
    """x (B, C, *S) -> (B * prod(out_sp), C * prod(K)) patch matrix."""
    n = len(ksize)
    bsz, cin = x.shape[:2]
    out_sp = _out_spatial(x.shape[2:], ksize, strides)
    cols = []
    for kidx in itertools.product(*[range(k) for k in ksize]):
        sl = tuple(
            slice(ki, ki + st * od, st) for ki, st, od in zip(kidx, strides, out_sp)
        )
        cols.append(x[(slice(None), slice(None)) + sl])
    # (B, C, *out_sp, K) -> (B, *out_sp, C, K)
    stacked = jnp.stack(cols, axis=-1)
    perm = (0,) + tuple(range(2, 2 + n)) + (1, 2 + n)
    stacked = jnp.transpose(stacked, perm)
    return stacked.reshape(bsz * prod(out_sp), cin * prod(ksize)), out_sp


def _dim_numbers(n):
    sp = "DHW"[3 - n :]
    return ("NC" + sp, "OI" + sp, "NC" + sp)


def _xla_conv(x, w, strides):
    """XLA's native conv emitter -- the optimal MXU path for conv shapes."""
    n = w.ndim - 2
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding="VALID",
        dimension_numbers=_dim_numbers(n),
        precision=jax.lax.Precision.HIGHEST,
    )


def _conv_fwd_impl(x, w, strides, mode):
    n = w.ndim - 2
    strides = _norm_strides(strides, n)
    if mode == "xla":
        return _xla_conv(x, w, strides)
    bsz, cout = x.shape[0], w.shape[0]
    pm, out_sp = _patches(x, w.shape[2:], strides)
    w_flat = w.reshape(cout, -1)
    out = _matmul_impl(pm, w_flat.T, mode)  # (B*out, Cout)
    out = out.reshape((bsz,) + out_sp + (cout,))
    return jnp.moveaxis(out, -1, 1)


def _conv_bwd_impl(g, x, w, strides, mode):
    n = w.ndim - 2
    strides = _norm_strides(strides, n)
    if mode == "xla":
        # jax AD emits the canonical transpose convs for input/weight grads
        _, vjp = jax.vjp(lambda xx, ww: _xla_conv(xx, ww, strides), x, w)
        return tuple(vjp(g))
    bsz, cout = x.shape[0], w.shape[0]
    out_sp = g.shape[2:]
    g_flat = jnp.moveaxis(g, 1, -1).reshape(bsz * prod(out_sp), cout)
    pm, _ = _patches(x, w.shape[2:], strides)
    # weight grad: (Cout, B*out) @ (B*out, C*K)
    gw = _matmul_impl(g_flat.T, pm, mode).reshape(w.shape)
    # input grad: cols = (B*out, C*K), then col2im scatter-add
    gcols = _matmul_impl(g_flat, w.reshape(cout, -1), mode)
    gcols = gcols.reshape((bsz,) + tuple(out_sp) + (x.shape[1],) + w.shape[2:])
    # (B, *out_sp, C, *K) -> (B, C, *out_sp, *K)
    gcols = jnp.moveaxis(gcols, 1 + n, 1)
    gx = jnp.zeros(x.shape, dtype=g.dtype)
    for kidx in itertools.product(*[range(k) for k in w.shape[2:]]):
        sl = tuple(
            slice(ki, ki + st * od, st) for ki, st, od in zip(kidx, strides, out_sp)
        )
        tap = gcols[(Ellipsis,) + kidx]
        gx = gx.at[(slice(None), slice(None)) + sl].add(tap)
    return gx, gw


@functools.lru_cache(maxsize=None)
def _build_fwd(strides, mode):
    return jax.jit(functools.partial(_conv_fwd_impl, strides=strides, mode=mode))


@functools.lru_cache(maxsize=None)
def _build_bwd(strides, mode):
    return jax.jit(functools.partial(_conv_bwd_impl, strides=strides, mode=mode))


def conv_fwd(x, w, strides=1):
    key = strides if isinstance(strides, int) else tuple(strides)
    return _build_fwd(key, resolve_mode("conv"))(x, w)


def conv_bwd(g, x, w, strides=1):
    key = strides if isinstance(strides, int) else tuple(strides)
    return _build_bwd(key, resolve_mode("conv"))(g, x, w)
