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

from .runtime import INTERPRET, kernel_mode, resolve_mode, cdiv, round_up

__all__ = ["matmul"]

_BM, _BN, _BK = 256, 256, 512

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


def _mm_kernel(a_ref, b_ref, o_ref, acc_ref, *, nk):
    k = pl.program_id(3)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(
        a_ref[0],
        b_ref[0],
        preferred_element_type=jnp.float32,
        # full-precision multiplication: the MXU's default bf16 passes lose
        # ~3 decimal digits, which breaks the 5e-4 gradcheck tolerance
        precision=_precision(),
    )

    @pl.when(k == nk - 1)
    def _():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def _pallas_matmul3(a, b):
    """a: (B, M, K), b: (B, K, N) -> (B, M, N)."""
    B, M, K = a.shape
    N = b.shape[2]
    bm = min(round_up(M, 8), _BM)
    bn = min(round_up(N, 128), _BN)
    bk = min(round_up(K, 128), _BK)
    # K must be an exact multiple: garbage in the contraction dim would
    # pollute valid outputs (M/N boundary garbage only lands on masked rows)
    kp = round_up(K, bk)
    if kp != K:
        a = jnp.pad(a, ((0, 0), (0, 0), (0, kp - K)))
        b = jnp.pad(b, ((0, 0), (0, kp - K), (0, 0)))
    nk = kp // bk
    grid = (B, cdiv(M, bm), cdiv(N, bn), nk)
    out_dtype = jnp.result_type(a.dtype, b.dtype)
    return pl.pallas_call(
        functools.partial(_mm_kernel, nk=nk),
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
        interpret=INTERPRET,
    )(a, b)


def _matmul_impl(a, b, mode):
    assert a.ndim >= 2 and b.ndim >= 2, "matmul requires >=2-D operands"
    if mode == "xla":
        return jnp.matmul(a, b, precision=_precision())
    # canonicalize to (B, M, K) x (B, K, N) with numpy batch broadcasting
    batch = jnp.broadcast_shapes(a.shape[:-2], b.shape[:-2])
    a3 = jnp.broadcast_to(a, batch + a.shape[-2:]).reshape(
        (prod(batch, start=1),) + a.shape[-2:]
    )
    b3 = jnp.broadcast_to(b, batch + b.shape[-2:]).reshape(
        (prod(batch, start=1),) + b.shape[-2:]
    )
    out = _pallas_matmul3(a3, b3)
    return out.reshape(batch + out.shape[-2:])


@functools.lru_cache(maxsize=None)
def _build(mode):
    return jax.jit(functools.partial(_matmul_impl, mode=mode))


def matmul(a, b):
    return _build(resolve_mode("matmul"))(a, b)
