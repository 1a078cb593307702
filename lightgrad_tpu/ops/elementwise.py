"""The Pallas elementwise kernel family ("atom" family).

TPU-native successor of the reference's runtime-generated OpenCL elementwise
codegen (``/root/reference/lightgrad/autograd/opencl/kernels.py:24-195``): one
generic N-ary, multi-output, broadcast-aware kernel builder.  The reference's
two best ideas survive in TPU form:

* *contiguous-dim collapsing* (reference kernels.py:109-122): adjacent dims
  with identical broadcast signatures are merged before blocking, minimizing
  grid rank and index arithmetic;
* *stride-0 broadcasting* (reference kernels.py:162-165): a broadcast input
  dim becomes a size-1 block whose index map pins it to 0, so the operand is
  never materialized at the output shape -- in-kernel VPU broadcasting does
  the expansion for free;
* *fused multi-output backwards* (reference opencl/ops.py:80-83): ``n_out>1``
  lets a binary op's backward emit both input gradients in a single pass over
  memory.

Everything is assembled at ``jax.jit`` trace time, so eager dispatch costs one
cache lookup.
"""

import functools
from math import prod

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .runtime import interpret, kernel_mode, resolve_mode, cdiv

__all__ = ["ew"]

# per-operand VMEM block budget (elements); 128Ki f32 = 512 KiB
_TARGET_ELEMS = 128 * 1024
_MAX_LANE_BLOCK = 2048


def _canonicalize(shapes):
    """Rank-align shapes and merge adjacent dims with equal broadcast signature.

    Returns ``(out_shape, aligned_input_shapes)`` where every shape has the
    same (minimal, >=2) rank.
    """
    rank = max([len(s) for s in shapes] + [1])
    aligned = [(1,) * (rank - len(s)) + tuple(s) for s in shapes]
    out = tuple(max(dims) for dims in zip(*aligned))
    sig = [tuple(a[d] != out[d] for a in aligned) for d in range(rank)]
    groups, cur = [], [0]
    for d in range(1, rank):
        if sig[d] == sig[d - 1]:
            cur.append(d)
        else:
            groups.append(cur)
            cur = [d]
    groups.append(cur)
    out = tuple(prod(out[d] for d in grp) for grp in groups)
    aligned = [tuple(prod(a[d] for d in grp) for grp in groups) for a in aligned]
    # ensure rank >= 2 for TPU tiling
    while len(out) < 2:
        out = (1,) + out
        aligned = [(1,) + a for a in aligned]
    return out, aligned


def _pallas_ew(fn, n_out, *xs):
    """Trace-time construction of the blocked elementwise pallas call."""
    # abstract evaluation gives the output shapes/dtypes under full numpy
    # broadcasting semantics
    out_abs = jax.eval_shape(lambda *a: fn(*a), *xs)
    out_abs = out_abs if isinstance(out_abs, (tuple, list)) else (out_abs,)
    full_out_shape = out_abs[0].shape

    shapes = [x.shape for x in xs] + [o.shape for o in out_abs]
    out_shape, aligned = _canonicalize(shapes)
    in_aligned = aligned[: len(xs)]
    rank = len(out_shape)
    lead = rank - 2
    M, N = out_shape[-2], out_shape[-1]

    bn = min(N, _MAX_LANE_BLOCK)
    bm = max(1, min(M, _TARGET_ELEMS // max(bn, 1)))
    if bm >= 8:
        bm = (bm // 8) * 8

    grid = tuple(out_shape[:lead]) + (cdiv(M, bm), cdiv(N, bn))

    def spec_for(shape):
        block = tuple(
            1 if shape[d] == 1 else (bm if d == lead else (bn if d == lead + 1 else 1))
            for d in range(rank)
        )

        def imap(*ids, _shape=shape):
            return tuple(0 if _shape[d] == 1 else ids[d] for d in range(rank))

        return pl.BlockSpec(block, imap, memory_space=pltpu.VMEM)

    in_specs = [spec_for(s) for s in in_aligned]
    out_spec = spec_for(out_shape)
    n_in = len(xs)

    def kernel(*refs):
        vals = [r[...] for r in refs[:n_in]]
        res = fn(*vals)
        res = res if isinstance(res, (tuple, list)) else (res,)
        for o_ref, r in zip(refs[n_in:], res):
            o_ref[...] = jnp.broadcast_to(r, o_ref.shape).astype(o_ref.dtype)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct(out_shape, o.dtype) for o in out_abs],
        interpret=interpret(),
    )(*[x.reshape(s) for x, s in zip(xs, in_aligned)])

    outs = [o.reshape(full_out_shape) for o in outs]
    return tuple(outs) if n_out > 1 else outs[0]


@functools.lru_cache(maxsize=None)
def _build(fn, n_out, mode):
    if mode == "pallas":
        return jax.jit(functools.partial(_pallas_ew, fn, n_out))
    return jax.jit(lambda *xs: fn(*xs))


def ew(fn, *xs, n_out: int = 1):
    """Apply elementwise ``fn`` over broadcastable jnp operands.

    ``fn`` must be a module-level (stable-identity) function of jnp arrays
    returning one array or a tuple of ``n_out`` arrays.
    """
    return _build(fn, n_out, resolve_mode("elementwise"))(*xs)
