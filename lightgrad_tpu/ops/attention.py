"""Fused scaled-dot-product attention: flash-style Pallas forward.

The reference materializes the full (b, h, s, s) score tensor and runs the
5-op composite softmax over it (reference bert.py:79-85) -- O(s^2) HBM
traffic.  This kernel streams K/V blocks through VMEM with an online softmax
(running max/denominator), so scores never touch HBM.

Backward currently recomputes scores in one fused XLA program (flash-bwd
Pallas kernel is a planned refinement); residuals are just (q, k, v, out is
not needed).
"""

import functools
from math import prod

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .runtime import INTERPRET, kernel_mode, resolve_mode, cdiv

__all__ = ["attention_fwd", "attention_bwd"]

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale, nk, bk, bq, s, causal):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (bq, d)
    k = k_ref[0]  # (bk, d)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # MXU defaults to bf16 passes
    ) * scale  # (bq, bk)
    if s % bk != 0 or causal:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + kb * bk
        valid = col < s
        if causal:
            row = (
                jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
                + pl.program_id(1) * bq
            )
            valid = jnp.logical_and(valid, col <= row)
        scores = jnp.where(valid, scores, _NEG_INF)

    m_prev = m_ref[...]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
    p = jnp.exp(scores - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    m_ref[...] = m_new

    @pl.when(kb == nk - 1)
    def _():
        o_ref[0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)


def _flash_fwd(q, k, v, scale, causal=False):
    """q, k, v: (B, S, D) -> (B, S, D)."""
    b, s, d = q.shape
    bq = min(256, max(8, (min(s, 256) // 8) * 8))
    bk = min(512, s if s % 128 == 0 else s)
    bk = min(bk, 2048)
    nq, nk = cdiv(s, bq), cdiv(s, bk)
    return pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, nk=nk, bk=bk, bq=bq, s=s, causal=causal),
        grid=(b, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda h, i, j: (h, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda h, i, j: (h, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        interpret=INTERPRET,
    )(q, k, v)


def _causal_mask(s):
    row = jnp.arange(s)[:, None]
    col = jnp.arange(s)[None, :]
    return jnp.where(col <= row, 0.0, _NEG_INF).astype(jnp.float32)


def _attn_fwd_impl(q, k, v, scale, mode, causal=False):
    shape = q.shape  # (..., S, D)
    s, d = shape[-2], shape[-1]
    b = prod(shape[:-2])
    q3, k3, v3 = (x.reshape(b, s, d) for x in (q, k, v))
    if mode == "xla":
        scores = jnp.einsum("bqd,bkd->bqk", q3, k3,
                            precision=jax.lax.Precision.HIGHEST) * scale
        if causal:
            scores = scores + _causal_mask(s)
        probs = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bqk,bkd->bqd", probs, v3,
                          precision=jax.lax.Precision.HIGHEST).reshape(shape)
    return _flash_fwd(q3, k3, v3, scale, causal=causal).reshape(shape)


def _attn_bwd_impl(g, q, k, v, scale, mode, causal=False):
    """Recompute-based backward (one fused XLA program)."""
    shape = q.shape
    s, d = shape[-2], shape[-1]
    b = prod(shape[:-2])
    g3, q3, k3, v3 = (x.reshape(b, s, d) for x in (g, q, k, v))
    prec = jax.lax.Precision.HIGHEST
    scores = jnp.einsum("bqd,bkd->bqk", q3, k3, precision=prec) * scale
    if causal:
        scores = scores + _causal_mask(s)
    p = jax.nn.softmax(scores, axis=-1)
    dv = jnp.einsum("bqk,bqd->bkd", p, g3, precision=prec)
    dp = jnp.einsum("bqd,bkd->bqk", g3, v3, precision=prec)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bqk,bkd->bqd", ds, k3, precision=prec) * scale
    dk = jnp.einsum("bqk,bqd->bkd", ds, q3, precision=prec) * scale
    return dq.reshape(shape), dk.reshape(shape), dv.reshape(shape)


@functools.lru_cache(maxsize=None)
def _build(which, scale, mode, causal):
    impl = _attn_fwd_impl if which == "fwd" else _attn_bwd_impl
    return jax.jit(functools.partial(impl, scale=scale, mode=mode, causal=causal))


def attention_fwd(q, k, v, scale: float, causal: bool = False):
    mode = resolve_mode("attention", seq=q.shape[-2])
    return _build("fwd", float(scale), mode, causal)(q, k, v)


def attention_bwd(g, q, k, v, scale: float, causal: bool = False):
    mode = resolve_mode("attention", seq=q.shape[-2])
    return _build("bwd", float(scale), mode, causal)(g, q, k, v)
