"""Fused LayerNorm Pallas kernels (forward + input-gradient).

The reference's LayerNorm is an ~12-node composite over mean/var primitives
(reference nn.py:109-124); here the whole normalization (mean, variance,
rsqrt, scale, shift) is one VMEM-resident pass per row block.  The backward
input gradient is the standard fused form

    dx = rstd * (gw - mean(gw) - x_hat * mean(gw * x_hat)),  gw = g * weight

in a single kernel; weight/bias gradients are row reductions done by the
reduce kernel family.
"""

import functools
from math import prod

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .runtime import interpret, kernel_mode, resolve_mode, cdiv

__all__ = ["layernorm_fwd", "layernorm_bwd_dx"]

_ROW_BUDGET = 256 * 1024


def _fwd_kernel(x_ref, w_ref, b_ref, o_ref, xhat_ref, rstd_ref, *, eps):
    x = x_ref[...]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    d = x - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = d * rstd
    xhat_ref[...] = xhat
    rstd_ref[...] = rstd
    o_ref[...] = xhat * w_ref[...] + b_ref[...]


def _bwd_kernel(g_ref, w_ref, xhat_ref, rstd_ref, o_ref):
    gw = g_ref[...] * w_ref[...]
    xhat = xhat_ref[...]
    m1 = jnp.mean(gw, axis=-1, keepdims=True)
    m2 = jnp.mean(gw * xhat, axis=-1, keepdims=True)
    o_ref[...] = rstd_ref[...] * (gw - m1 - xhat * m2)


def _block_rows(r, c):
    bm = max(8, min(r, _ROW_BUDGET // max(c, 1)))
    return (bm // 8) * 8 if bm >= 8 else bm


def _ln_fwd_impl(x, w, b, eps, mode):
    shape = x.shape
    c = prod(w.shape)
    r = prod(shape) // c
    x2, w2, b2 = x.reshape(r, c), w.reshape(1, c), b.reshape(1, c)
    if mode == "xla":
        mu = jnp.mean(x2, axis=-1, keepdims=True)
        d = x2 - mu
        var = jnp.mean(d * d, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xhat = d * rstd
        return (xhat * w2 + b2).reshape(shape), xhat, rstd
    bm = _block_rows(r, c)
    row_spec = pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    y, xhat, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(cdiv(r, bm),),
        in_specs=[row_spec, vec_spec, vec_spec],
        out_specs=[row_spec, row_spec, col_spec],
        out_shape=[
            jax.ShapeDtypeStruct((r, c), x.dtype),
            jax.ShapeDtypeStruct((r, c), x.dtype),
            jax.ShapeDtypeStruct((r, 1), x.dtype),
        ],
        interpret=interpret(),
    )(x2, w2, b2)
    return y.reshape(shape), xhat, rstd


def _ln_bwd_impl(g, w, xhat, rstd, mode):
    r, c = xhat.shape
    g2, w2 = g.reshape(r, c), w.reshape(1, c)
    if mode == "xla":
        gw = g2 * w2
        m1 = jnp.mean(gw, axis=-1, keepdims=True)
        m2 = jnp.mean(gw * xhat, axis=-1, keepdims=True)
        return rstd * (gw - m1 - xhat * m2)
    bm = _block_rows(r, c)
    row_spec = pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(cdiv(r, bm),),
        in_specs=[row_spec, vec_spec, row_spec, col_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((r, c), g.dtype),
        interpret=interpret(),
    )(g2, w2, xhat, rstd)


@functools.lru_cache(maxsize=None)
def _build(which, eps, mode):
    if which == "fwd":
        return jax.jit(functools.partial(_ln_fwd_impl, eps=eps, mode=mode))
    return jax.jit(functools.partial(_ln_bwd_impl, mode=mode))


def layernorm_fwd(x, w, b, eps=1e-5):
    """Returns (y, xhat, rstd); xhat/rstd are residuals for the backward."""
    return _build("fwd", float(eps), resolve_mode("layernorm"))(x, w, b)


def layernorm_bwd_dx(g, w, xhat, rstd):
    """Input gradient (flattened rows); caller reduces for dw/db."""
    return _build("bwd", 0.0, resolve_mode("layernorm"))(g, w, xhat, rstd)
