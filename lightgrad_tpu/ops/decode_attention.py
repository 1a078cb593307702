"""Fused single-token decode attention over a fixed-window KV cache.

One decoded token's attention in the XLA path is ~6 small ops per layer
(score einsum, mask where, 3-op softmax, context einsum) -- measured ~0.12 ms
of a 0.96 ms GPT-2-small decode step, ~10x its HBM-traffic lower bound,
because each op is a separate thunk launch on ~KB-sized operands
(benchmarks/decode_budget.py).  This kernel runs the whole chain (scores +
position mask + softmax + context) in ONE pallas_call that streams the K/V
window through VMEM once.

Grouped-query native: q arrives as (KV, G, hd) -- the G query heads served
by each KV head -- so GQA costs one (G, W) GEMM per KV head with no repeat.

The decode position arrives as a (1, 1) SMEM scalar, so one compiled kernel
serves every step of a ``lax.scan`` decode loop.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .runtime import interpret, kernel_mode

__all__ = ["decode_attention"]

_NEG_INF = -1e30


def _kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, *, scale, window):
    pos = pos_ref[0, 0]
    q = q_ref[0]                                      # (G, hd)
    k = k_ref[0]                                      # (W, hd)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale   # (G, W)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    ok = col <= pos
    if window:
        ok = jnp.logical_and(ok, col > pos - window)
    s = jnp.where(ok, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    v = v_ref[0]                                      # (W, hd)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _xla_impl(q, kc, vc, pos, scale, window):
    KV, G, hd = q.shape
    W = kc.shape[1]
    ok = (jnp.arange(W) <= pos)[None, None, :]
    if window:
        ok = jnp.logical_and(ok, (jnp.arange(W) > pos - window)[None, None, :])
    s = jnp.einsum("kgd,ksd->kgs", q, kc) * scale
    s = jnp.where(ok, s, _NEG_INF)
    return jnp.einsum("kgs,ksd->kgd", jax.nn.softmax(s, axis=-1), vc)


def decode_attention(q, kc, vc, pos, scale: float, window: int = 0):
    """q: (KV, G, hd) one token's queries (kv-major head order);
    kc, vc: (KV, W, hd) cache; pos: int32 scalar (absolute position of the
    token, keys at ``<= pos`` visible, optionally banded by ``window``).
    Returns (KV, G, hd) context in q's dtype."""
    if kernel_mode() == "xla":
        return _xla_impl(q, kc, vc, pos, scale, window).astype(q.dtype)
    KV, G, hd = q.shape
    W = kc.shape[1]
    pos2d = jnp.asarray(pos, jnp.int32).reshape(1, 1)
    return pl.pallas_call(
        functools.partial(_kernel, scale=float(scale), window=int(window)),
        grid=(KV,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda h: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G, hd), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, hd), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, hd), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, hd), lambda h: (h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((KV, G, hd), q.dtype),
        interpret=interpret(),
    )(pos2d, q, kc, vc)
