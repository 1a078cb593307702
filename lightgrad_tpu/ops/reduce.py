"""Arbitrary-axis reduction Pallas kernels (sum / max / min).

TPU-native successor of the reference's two-stage OpenCL tree reduction
(``/root/reference/lightgrad/autograd/opencl/kernels.py:344-501``).  Same
canonicalization idea (transpose reduce axes last, reference kernels.py:
457-461) but instead of host-side looping until one partial remains, a single
Pallas kernel walks the reduce dim with the output block held resident in VMEM
across the sequential TPU grid -- boundary lanes are masked with the op's
neutral element (the analogue of the reference's neutral-parameterized
templates: ``0`` / ``-INFINITY``).
"""

import functools
from math import prod

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .runtime import interpret, kernel_mode, resolve_mode, cdiv

__all__ = ["reduce"]

_OPS = {
    "sum": (jnp.sum, jnp.add, 0.0),
    "max": (jnp.max, jnp.maximum, -jnp.inf),
    "min": (jnp.min, jnp.minimum, jnp.inf),
}

_BK, _BR = 512, 2048


def _reduce_kernel(x_ref, o_ref, *, op, br, r):
    jnp_red, combine, neutral = _OPS[op]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[...] = jnp.full_like(o_ref, neutral)

    blk = x_ref[...]
    if r % br != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 1)
        blk = jnp.where(col + j * br < r, blk, jnp.asarray(neutral, blk.dtype))
    o_ref[...] = combine(o_ref[...], jnp_red(blk, axis=1, keepdims=True))


def _pallas_reduce2(x2, op):
    """x2: (K, R) -> (K, 1), reducing axis 1."""
    k_dim, r_dim = x2.shape
    bk = min(k_dim, _BK)
    if bk >= 8:
        bk = (bk // 8) * 8
    br = min(r_dim, _BR)
    grid = (cdiv(k_dim, bk), cdiv(r_dim, br))
    out_dtype = x2.dtype if op != "sum" else jnp.promote_types(x2.dtype, jnp.float32) if jnp.issubdtype(x2.dtype, jnp.floating) else x2.dtype
    return pl.pallas_call(
        functools.partial(_reduce_kernel, op=op, br=br, r=r_dim),
        grid=grid,
        in_specs=[pl.BlockSpec((bk, br), lambda i, j: (i, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bk, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_dim, 1), out_dtype),
        interpret=interpret(),
    )(x2)


def _normalize_axes(axis, rank):
    if axis is None:
        return tuple(range(rank))
    axes = axis if isinstance(axis, (tuple, list)) else (axis,)
    return tuple(sorted(a % rank for a in axes))


def _reduce_impl(x, mode, op, axes, keepdims):
    rank = x.ndim
    axes = _normalize_axes(axes, rank)
    if mode == "xla":
        return _OPS[op][0](x, axis=axes if axes else None, keepdims=keepdims)
    keep = tuple(d for d in range(rank) if d not in axes)
    perm = keep + axes
    xt = jnp.transpose(x, perm) if perm != tuple(range(rank)) else x
    kshape = tuple(x.shape[d] for d in keep)
    k_dim = prod(kshape)
    r_dim = prod(x.shape[d] for d in axes)
    out2 = _pallas_reduce2(xt.reshape(k_dim, r_dim), op).astype(x.dtype)
    if keepdims:
        return out2.reshape(tuple(1 if d in axes else x.shape[d] for d in range(rank)))
    return out2.reshape(kshape)


@functools.lru_cache(maxsize=None)
def _build(mode, op, axes_key, keepdims):
    return jax.jit(
        functools.partial(_reduce_impl, mode=mode, op=op, axes=axes_key, keepdims=keepdims)
    )


def reduce(x, op: str, axis=None, keepdims: bool = False):
    axes_key = axis if (axis is None or isinstance(axis, int)) else tuple(axis)
    return _build(resolve_mode("reduce"), op, axes_key, keepdims)(x)
