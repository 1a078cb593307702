"""Batched MXU matmul Pallas kernel.

TPU-native successor of the reference's tiled OpenCL GEMM
(``/root/reference/lightgrad/autograd/opencl/kernels.py:201-337``).  The
reference's local-memory/register tiling maps onto the MXU systolic array:
(BM, BN) output tiles with a float32 VMEM accumulator, sequential grid over K
so the accumulator block stays resident (the Pallas revisiting pattern), and
zero-padding of K to the tile multiple (the analogue of the reference's
``_match_blocks`` M/N padding, kernels.py:291-298; M/N boundary blocks need no
padding because out-of-range rows/columns never reach a valid output element).

Backward GEMMs (``dA = G @ B^T``, ``dB = A^T @ G``) reuse the same kernel on
transposed views -- mirroring the reference's opencl dot backward
(opencl/ops.py:116-132) but with the transposes folded into XLA.
"""

import functools
from math import prod

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .runtime import interpret, kernel_mode, resolve_mode, cdiv, round_up

__all__ = ["matmul"]

_BM, _BN, _BK = 256, 256, 512


def _default_blocks(adt, bdt):
    """Measured-best block shape per input dtype (benchmarks/gemm_sweep.json).

    bf16 halves the bytes per element, so the contraction tile can double
    within the same VMEM budget; blocks >= (512, 512, 1024) crash the
    tunneled remote compiler on this host, so the bf16 config stays at
    (512, 512, 512).
    """
    if adt == jnp.bfloat16 and bdt == jnp.bfloat16:
        return (512, 512, 512)
    return (_BM, _BN, _BK)

# float32 matmul precision: 'highest' (3x bf16 passes, full f32 accuracy --
# required for the reference's 5e-4 gradcheck tolerances) or 'default'
# (single bf16 pass, ~6x the throughput).  bfloat16 inputs always take the
# fast path; use set_precision('default') for f32 training at speed.
_PRECISION = "highest"


def set_precision(p: str) -> str:
    global _PRECISION
    assert p in ("highest", "default"), p
    prev, _PRECISION = _PRECISION, p
    # invalidate compiled kernels so the new precision takes effect
    _build.cache_clear()
    return prev


def _precision():
    return (
        jax.lax.Precision.HIGHEST if _PRECISION == "highest" else jax.lax.Precision.DEFAULT
    )


def _mm_kernel(a_ref, b_ref, o_ref, acc_ref, *, nk, precision):
    k = pl.program_id(3)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(
        a_ref[0],
        b_ref[0],
        preferred_element_type=jnp.float32,
        # f32 inputs: full-precision multiplication (the MXU's default bf16
        # passes lose ~3 decimal digits, breaking the 5e-4 gradcheck
        # tolerance).  bf16 inputs: always DEFAULT -- the MXU consumes bf16
        # natively, and HIGHEST on bf16 operands crashes the Mosaic compiler
        # on this host (remote-compiler HTTP 500, measured round 2).
        precision=precision,
    )

    @pl.when(k == nk - 1)
    def _():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def _pallas_matmul3(a, b, blocks=None):
    """a: (B, M, K), b: (B, K, N) -> (B, M, N)."""
    B, M, K = a.shape
    N = b.shape[2]
    if blocks is None:
        blocks = _default_blocks(a.dtype, b.dtype)
    BM, BN, BK = blocks
    bm = min(round_up(M, 8), BM)
    bn = min(round_up(N, 128), BN)
    bk = min(round_up(K, 128), BK)
    # K must be an exact multiple: garbage in the contraction dim would
    # pollute valid outputs (M/N boundary garbage only lands on masked rows)
    kp = round_up(K, bk)
    if kp != K:
        a = jnp.pad(a, ((0, 0), (0, 0), (0, kp - K)))
        b = jnp.pad(b, ((0, 0), (0, kp - K), (0, 0)))
    nk = kp // bk
    grid = (B, cdiv(M, bm), cdiv(N, bn), nk)
    out_dtype = jnp.result_type(a.dtype, b.dtype)
    prec = (jax.lax.Precision.DEFAULT
            if a.dtype == jnp.bfloat16 and b.dtype == jnp.bfloat16
            else _precision())
    return pl.pallas_call(
        functools.partial(_mm_kernel, nk=nk, precision=prec),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, bk), lambda h, i, j, k: (h, i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, bn), lambda h, i, j, k: (h, k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bm, bn), lambda h, i, j, k: (h, i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * N * kp,
            bytes_accessed=(B * M * kp + B * kp * N + B * M * N) * a.dtype.itemsize,
            transcendentals=0,
        ),
        # B/M/N grid axes are embarrassingly parallel; K is a sequential
        # reduction ("arbitrary") -- lets Mosaic pipeline the K loop with the
        # accumulator resident instead of assuming revisiting hazards
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret(),
    )(a, b)


def _matmul_impl(a, b, mode, blocks=None):
    assert a.ndim >= 2 and b.ndim >= 2, "matmul requires >=2-D operands"
    if mode == "xla":
        # bf16 operands: DEFAULT precision (native MXU passes, f32
        # accumulate).  HIGHEST would request f32 multiplication -- pure
        # slowdown with no accuracy left to gain at bf16 inputs.  The f32
        # path keeps the configured highest/default switch.
        prec = (jax.lax.Precision.DEFAULT
                if a.dtype == jnp.bfloat16 and b.dtype == jnp.bfloat16
                else _precision())
        return jnp.matmul(a, b, precision=prec)
    # canonicalize to (B, M, K) x (B, K, N) with numpy batch broadcasting
    batch = jnp.broadcast_shapes(a.shape[:-2], b.shape[:-2])
    a3 = jnp.broadcast_to(a, batch + a.shape[-2:]).reshape(
        (prod(batch, start=1),) + a.shape[-2:]
    )
    b3 = jnp.broadcast_to(b, batch + b.shape[-2:]).reshape(
        (prod(batch, start=1),) + b.shape[-2:]
    )
    out = _pallas_matmul3(a3, b3, blocks=blocks)
    return out.reshape(batch + out.shape[-2:])


@functools.lru_cache(maxsize=None)
def _build(mode, blocks=None):
    if mode == "pallas" and blocks is not None:
        return jax.jit(functools.partial(_matmul_impl_blocks, blocks=blocks))
    return jax.jit(functools.partial(_matmul_impl, mode=mode))


def _matmul_impl_blocks(a, b, blocks):
    return _matmul_impl(a, b, "pallas", blocks=blocks)


@functools.lru_cache(maxsize=1)
def _policy():
    """Measured routing table written by benchmarks/gemm_sweep.py."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "gemm_policy.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


_BUCKETS = (512, 1024, 2048, 4096)


def _route(a, b):
    """Resolve 'auto' for one matmul call against the measured sweep table
    (per precision config and size bucket); default XLA when unmeasured."""
    mode = resolve_mode("matmul")
    if mode != "auto":
        return mode, None
    if a.ndim < 2 or b.ndim < 2:
        return "xla", None
    tag = ("bf16" if a.dtype == jnp.bfloat16 and b.dtype == jnp.bfloat16
           else f"f32_{_PRECISION}")
    n = min(a.shape[-2], a.shape[-1], b.shape[-1])
    if n < 256:
        # below the measured regime: dispatch/pipeline-bound, and Mosaic
        # rejects some tiny bf16 tiles ("Bad rhs type") -- XLA always
        return "xla", None
    bucket = min(_BUCKETS, key=lambda c: abs(c - n))
    choice = _policy().get(tag, {}).get(str(bucket))
    if choice and choice.get("impl") == "pallas":
        return "pallas", tuple(choice["blocks"])
    return "xla", None


def _reduce_to(x, shape):
    """Sum ``x`` down to ``shape`` (undo batch broadcasting in backward)."""
    extra = x.ndim - len(shape)
    if extra:
        x = x.sum(axis=tuple(range(extra)))
    axes = tuple(i for i, s in enumerate(shape) if s == 1 and x.shape[i] != 1)
    if axes:
        x = x.sum(axis=axes, keepdims=True)
    return x


@functools.lru_cache(maxsize=None)
def _pallas_vjp(blocks):
    """jax-differentiable pallas GEMM (one instance per block config).

    ``pallas_call`` has no automatic differentiation rule, so anything that
    runs the hand-written GEMM under ``jax.vjp``/``jax.grad`` -- the
    scan-over-layers recorder (lightgrad_tpu/scan.py), ``module_stages``
    pipelines, plain jax user code -- needs this custom VJP.  The backward
    re-enters :func:`matmul`, so gradient GEMMs take their own measured
    routing."""

    @jax.custom_vjp
    def mm(a, b):
        return _matmul_impl(a, b, "pallas", blocks=blocks)

    def fwd(a, b):
        return mm(a, b), (a, b)

    def bwd(res, g):
        a, b = res
        ga = _reduce_to(matmul(g, jnp.swapaxes(b, -1, -2)), a.shape)
        gb = _reduce_to(matmul(jnp.swapaxes(a, -1, -2), g), b.shape)
        return ga, gb

    mm.defvjp(fwd, bwd)
    return jax.jit(mm)


def matmul(a, b):
    mode, blocks = _route(a, b)
    if mode == "pallas":
        return _pallas_vjp(blocks)(a, b)
    return _build(mode, blocks)(a, b)
