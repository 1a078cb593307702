"""Fused last-axis softmax Pallas kernels (forward + backward).

The reference computes softmax as a 5-op composite sub-tape
(max/sub/exp/sum/div, reference ops.py:62-66) -- five passes over HBM.  Here
one Pallas kernel keeps a row block resident in VMEM and does the whole
numerically-stable softmax in a single pass; the backward
(``dx = y * (g - sum(g*y))``) is likewise one fused pass.
"""

import functools
from math import prod

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .runtime import interpret, kernel_mode, resolve_mode, cdiv

__all__ = ["softmax_fwd", "softmax_bwd"]

_ROW_BUDGET = 512 * 1024  # elements per block (2 MiB f32)


def _fwd_kernel(x_ref, o_ref):
    x = x_ref[...]
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    o_ref[...] = e / jnp.sum(e, axis=-1, keepdims=True)


def _bwd_kernel(g_ref, y_ref, o_ref):
    g, y = g_ref[...], y_ref[...]
    gy = g * y
    o_ref[...] = gy - y * jnp.sum(gy, axis=-1, keepdims=True)


def _rows_call(kernel, n_in, *xs):
    """Run a row-wise kernel over (..., C) collapsed to (R, C) row blocks."""
    shape = xs[0].shape
    c = shape[-1]
    r = prod(shape[:-1])
    x2s = [x.reshape(r, c) for x in xs]
    bm = max(8, min(r, _ROW_BUDGET // max(c, 1)))
    if bm >= 8:
        bm = (bm // 8) * 8
    out = pl.pallas_call(
        kernel,
        grid=(cdiv(r, bm),),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ] * n_in,
        out_specs=pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, c), xs[0].dtype),
        interpret=interpret(),
    )(*x2s)
    return out.reshape(shape)


def _softmax_fwd_impl(x, mode):
    if mode == "xla":
        return jax.nn.softmax(x, axis=-1)
    return _rows_call(_fwd_kernel, 1, x)


def _softmax_bwd_impl(g, y, mode):
    if mode == "xla":
        return y * (g - jnp.sum(g * y, axis=-1, keepdims=True))
    return _rows_call(_bwd_kernel, 2, g, y)


@functools.lru_cache(maxsize=None)
def _build(which, mode):
    impl = _softmax_fwd_impl if which == "fwd" else _softmax_bwd_impl
    return jax.jit(functools.partial(impl, mode=mode))


def softmax_fwd(x):
    return _build("fwd", resolve_mode("softmax"))(x)


def softmax_bwd(g, y):
    return _build("bwd", resolve_mode("softmax"))(g, y)
