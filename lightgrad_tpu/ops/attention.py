"""Fused scaled-dot-product attention: flash-style Pallas kernels.

The reference materializes the full (b, h, s, s) score tensor and runs the
5-op composite softmax over it (reference bert.py:79-85) -- O(s^2) HBM
traffic.  The forward streams K/V blocks through VMEM with an online softmax
(running max/denominator) and emits the log-sum-exp residual; the backward is
the standard two-kernel flash scheme (dQ accumulated over K blocks; dK/dV
accumulated over Q blocks) with probabilities recomputed from the saved LSE,
so scores never touch HBM in either direction.  Supports causal masking.

In 'xla' kernel mode both directions fall back to fused einsum programs (the
right choice below the measured seq~1024 crossover).
"""

import functools
from math import prod

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .runtime import interpret, resolve_mode, cdiv

__all__ = ["attention_fwd", "attention_fwd_res", "attention_bwd"]

_NEG_INF = -1e30
_PREC = jax.lax.Precision.HIGHEST  # MXU defaults to bf16 passes otherwise


def _prec_for(*args):
    """f32 inputs: HIGHEST (full-precision MXU passes).  bf16 inputs:
    DEFAULT -- the MXU consumes bf16 natively, and HIGHEST on bf16 operands
    crashes the Mosaic compiler on this host (measured round 2)."""
    if all(a.dtype == jnp.bfloat16 for a in args):
        return jax.lax.Precision.DEFAULT
    return _PREC


def _dot(a, b, ta=False, tb=False):
    dims = (((0,) if ta else (1,), (1,) if tb else (0,)), ((), ()))
    return jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32,
        precision=_prec_for(a, b),
    )


def _zero_oob_rows(x, off, s):
    """Zero rows beyond the sequence. Out-of-bounds block rows read garbage
    (possibly NaN) which must never reach a contraction -- and 0 * NaN is
    still NaN, so this must select, not multiply."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0) + off
    return jnp.where(idx < s, x, jnp.zeros_like(x))


def _valid_mask(shape, row0, col0, s, causal, window=0):
    """(bq, bk) validity: inside the sequence, (optionally) causal, and
    (optionally) inside a sliding window -- HF Mistral semantics: position
    ``row`` attends to keys with ``0 <= row - col < window`` (``window``
    attended positions including self).  ``window=0`` disables banding."""
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + row0
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + col0
    valid = jnp.logical_and(row < s, col < s)
    if causal:
        valid = jnp.logical_and(valid, col <= row)
    if window:
        valid = jnp.logical_and(valid, row - col < window)
    return valid


def _pair_relevant(qb, bq, kb, bk, causal, window):
    """Whether the (q block, k block) pair has ANY unmasked cell -- the
    block-skip predicate.  Above-diagonal blocks are dead under causal;
    blocks entirely below the band are dead under a sliding window."""
    rel = None
    if causal:
        rel = kb * bk <= (qb + 1) * bq - 1
    if window:
        in_band = (kb + 1) * bk - 1 >= qb * bq - (window - 1)
        rel = in_band if rel is None else jnp.logical_and(rel, in_band)
    return rel


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------
def _fwd_kernel(q_ref, k_ref, v_ref, *rest,
                scale, nk, bk, bq, s, causal, have_lens=False, window=0):
    # optional trailing input: per-example valid length (right-padding mask
    # without materializing scores)
    if have_lens:
        lens_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, lse_ref, m_ref, l_ref, acc_ref = rest
    # bind program ids OUTSIDE _compute: under the causal pl.when the body
    # traces into a lax.cond branch, where program_id has no lowering rule
    # in interpret mode
    qb, kb = pl.program_id(1), pl.program_id(2)
    limit = lens_ref[0, 0] if have_lens else s

    @pl.when(kb == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def _compute():
        scores = _dot(q_ref[0], k_ref[0], tb=True) * scale  # (bq, bk)
        if s % bk != 0 or causal or have_lens or window:
            valid = _valid_mask(scores.shape, qb * bq, kb * bk, limit, causal,
                                window)
            scores = jnp.where(valid, scores, _NEG_INF)

        m_prev = m_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        p = jnp.exp(scores - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        v_blk = v_ref[0]
        if s % bk != 0:
            v_blk = _zero_oob_rows(v_blk, kb * bk, s)
        acc_ref[...] = acc_ref[...] * alpha + _dot(p.astype(v_blk.dtype), v_blk)
        m_ref[...] = m_new

    if causal or window:
        # fully-above-diagonal (causal) and fully-below-band (window) k
        # blocks contribute nothing: skip the pair
        pl.when(_pair_relevant(qb, bq, kb, bk, causal, window))(_compute)
    else:
        _compute()

    @pl.when(kb == nk - 1)
    def _():
        if have_lens:
            # padded query rows saw only -inf scores (l == 0): select zeros
            # instead of 0/0 NaN, and a well-defined lse of 0
            row = jax.lax.broadcasted_iota(
                jnp.int32, (bq, 1), 0) + qb * bq
            ok = row < limit
            l_safe = jnp.where(l_ref[...] == 0.0, 1.0, l_ref[...])
            o_ref[0] = jnp.where(ok, acc_ref[...] / l_safe, 0.0
                                 ).astype(o_ref.dtype)
            lse_ref[0] = jnp.where(ok, m_ref[...] + jnp.log(l_safe), 0.0
                                   ).astype(lse_ref.dtype)
        else:
            o_ref[0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)
            lse_ref[0] = (m_ref[...] + jnp.log(l_ref[...])
                          ).astype(lse_ref.dtype)


def _fwd_kernel_pair(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref,
                     acc_ref, *, scale, nk, bk, bq, s, causal, window=0):
    """Two heads per grid step (the d=64 ILP lever, VERDICT r3 #5 probe):
    the two heads' score/softmax/context chains are unrolled back to back
    in one kernel body, so Mosaic overlaps head A's VPU softmax (`exp` is
    the bottleneck when the score GEMM contracts over only d=64 -- half
    the MXU's rows) with head B's MXU dots, and the pipeline fetches half
    as many, twice-larger blocks.  Measured 2.05x over the one-head kernel
    at 96x2048x64 bf16 fwd (benchmarks/flash_pair_probe.py, 2026-08-20,
    interleaved pair-differenced).  Same math: parity-tested in
    tests/test_pallas.py."""
    qb, kb = pl.program_id(1), pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def _compute():
        need_mask = (s % bk != 0) or causal or window
        valid = (_valid_mask((bq, bk), qb * bq, kb * bk, s, causal, window)
                 if need_mask else None)
        for t in (0, 1):  # head-interleaved chains (the whole point)
            scores = _dot(q_ref[t], k_ref[t], tb=True) * scale  # (bq, bk)
            if need_mask:
                scores = jnp.where(valid, scores, _NEG_INF)
            m_prev = m_ref[t]
            m_new = jnp.maximum(m_prev,
                                jnp.max(scores, axis=-1, keepdims=True))
            p = jnp.exp(scores - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[t] = l_ref[t] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            v_blk = v_ref[t]
            if s % bk != 0:
                v_blk = _zero_oob_rows(v_blk, kb * bk, s)
            acc_ref[t] = acc_ref[t] * alpha + _dot(p.astype(v_blk.dtype),
                                                   v_blk)
            m_ref[t] = m_new

    if causal or window:
        pl.when(_pair_relevant(qb, bq, kb, bk, causal, window))(_compute)
    else:
        _compute()

    @pl.when(kb == nk - 1)
    def _():
        o_ref[...] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)
        lse_ref[...] = (m_ref[...] + jnp.log(l_ref[...])
                        ).astype(lse_ref.dtype)


# head-pair forward on/off (eligible cases only: MHA, NON-CAUSAL, no
# per-example lengths, even head count, d <= 64 -- at d=128 the score GEMM
# already fills the MXU contraction and the one-head kernel measured 38.5%
# MFU).  Hardware A/B (benchmarks/flash_pair_ab.py, 2026-08-21, interleaved
# per-pair differencing -- the only protocol that survived that day's
# 25-770 ms RTT swings): pair wins non-causal (0.884x time), loses causal
# (1.076x) where block-skip halves the work per grid step and the pair
# kernel's larger blocks waste more skipped-block bandwidth.  Hence causal
# stays on the one-head kernel.
_PAIR_FWD = True


def set_flash_pair(on):
    """True: pair the non-causal eligible cases (measured default).
    "all": pair causal/window too (A/B + test hook).  False: off."""
    global _PAIR_FWD
    prev = _PAIR_FWD
    _PAIR_FWD = on
    _build.cache_clear()
    return prev


# causal block-skip in the two-pass backward kernels (the forward always
# skips).  A/B hook: benchmarks/flash_tune.py --causal compares in-session.
_BWD_SKIP = True


def set_flash_bwd_skip(on: bool):
    global _BWD_SKIP
    prev = _BWD_SKIP
    _BWD_SKIP = on
    _build.cache_clear()
    return prev


# default flash block shape; overridable per-call (benchmarks/flash_tune.py
# sweeps these in-program on hardware: (512, 512) won the r3 sweep for the
# two-pass backward at both d=64 and d=128 -- bk=2048 loses ~2x in the
# dq pass)
_FLASH_BQ, _FLASH_BK = 512, 512


def set_flash_blocks(bq: int, bk: int):
    """Override the flash block shape (tuning harness hook)."""
    global _FLASH_BQ, _FLASH_BK
    prev = (_FLASH_BQ, _FLASH_BK)
    _FLASH_BQ, _FLASH_BK = bq, bk
    _build.cache_clear()
    return prev


def _attn_blocks(s):
    bq = min(_FLASH_BQ, max(8, (min(s, _FLASH_BQ) // 8) * 8))
    bk = min(_FLASH_BK, s if s % 128 == 0 else s)
    return bq, min(bk, 2048)


def _lens_spec():
    """(B,) int32 lengths arrive as a (B, 1) array; one scalar per batch
    row, broadcast to every (i, j) block pair."""
    return pl.BlockSpec((1, 1), lambda h, i, j: (h, 0),
                        memory_space=pltpu.VMEM)


def _flash_fwd(q, k, v, scale, causal, vma=None, lengths=None, window=0):
    """q: (B, S, D), k, v: (B/G, S, D) -> (out (B, S, D), lse (B, S, 1)).

    Grouped-query aware: when q carries G x the rows of k/v (GQA -- query
    head h reads KV head h // G, the kv-major head layout), the k/v
    BlockSpec index maps serve each group of G query rows from ONE K/V row
    -- no gather-expanded (B, S, D) K/V copy ever exists in HBM
    (models/llama.py r3 expanded via jnp.repeat: x(H/KV) K/V traffic and a
    scatter-add backward).

    ``vma``: mesh axes the outputs vary over -- required when called inside
    a vma-checked ``shard_map`` (ring attention blocks).  ``lengths``:
    optional (B,) int32 per-example valid lengths (right-padding); padded
    key columns are masked from every softmax and padded query rows output
    zeros."""
    b, s, d = q.shape
    groups = b // k.shape[0]
    assert b == k.shape[0] * groups, (q.shape, k.shape)
    bq, bk = _attn_blocks(s)
    nq, nk = cdiv(s, bq), cdiv(s, bk)
    row = lambda h, i, j: (h, i, 0)
    col = ((lambda h, i, j: (h // groups, j, 0)) if groups > 1
           else (lambda h, i, j: (h, j, 0)))
    sds = functools.partial(jax.ShapeDtypeStruct, **({} if vma is None else {"vma": vma}))
    have_lens = lengths is not None
    if (_PAIR_FWD and groups == 1 and not have_lens and b % 2 == 0
            and d <= 64 and vma is None
            and (_PAIR_FWD == "all" or (not causal and not window))):
        # two heads per grid step: a (2, bq, d) block over the SAME layout
        # serves head pair (2h, 2h+1) -- no reshape, no copy
        pair_row = lambda h, i, j: (h, i, 0)
        pair_col = lambda h, i, j: (h, j, 0)
        return pl.pallas_call(
            functools.partial(_fwd_kernel_pair, scale=scale, nk=nk, bk=bk,
                              bq=bq, s=s, causal=causal, window=window),
            grid=(b // 2, nq, nk),
            in_specs=[
                pl.BlockSpec((2, bq, d), pair_row, memory_space=pltpu.VMEM),
                pl.BlockSpec((2, bk, d), pair_col, memory_space=pltpu.VMEM),
                pl.BlockSpec((2, bk, d), pair_col, memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((2, bq, d), pair_row, memory_space=pltpu.VMEM),
                pl.BlockSpec((2, bq, 1), pair_row, memory_space=pltpu.VMEM),
            ],
            out_shape=[
                sds((b, s, d), q.dtype),
                sds((b, s, 1), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, bq, 1), jnp.float32),
                pltpu.VMEM((2, bq, 1), jnp.float32),
                pltpu.VMEM((2, bq, d), jnp.float32),
            ],
            interpret=interpret(),
        )(q, k, v)
    in_specs = [
        pl.BlockSpec((1, bq, d), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, d), col, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, d), col, memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if have_lens:
        in_specs.append(_lens_spec())
        args.append(jnp.asarray(lengths, jnp.int32).reshape(b, 1))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, nk=nk, bk=bk, bq=bq,
                          s=s, causal=causal, have_lens=have_lens,
                          window=window),
        grid=(b, nq, nk),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, bq, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            sds((b, s, d), q.dtype),
            sds((b, s, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        interpret=interpret(),
    )(*args)


# ---------------------------------------------------------------------------
# backward: dQ pass (grid over q blocks, streaming k) and dK/dV pass
# (grid over k blocks, streaming q).  p recomputed as exp(s - lse).
# ---------------------------------------------------------------------------
def _bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dcap_ref,
                      dqu_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                      *, scale, nq, bk, bq, s, causal):
    """Single-pass backward: per (k-block, q-block) step the scores and
    probabilities are computed ONCE and feed all three gradients -- dk/dv
    accumulate in VMEM scratch over the inner q walk, while dq is written
    UNREDUCED as a per-k-block slab (nk, b, s, d) summed outside the kernel
    (the splash-attention trick: HBM slabs sidestep the non-consecutive
    output-revisit hazard).  vs. the two-pass scheme this removes one full
    score recompute + exp sweep (5 GEMMs and 1 exp per block pair instead
    of 6 and 2), which matters because at d=64 the kernel is part
    VPU-bound (measured: block-shape-insensitive ~21% MFU)."""
    kb, qb = pl.program_id(1), pl.program_id(2)

    @pl.when(qb == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    def _zero_dq():
        dqu_ref[0, 0] = jnp.zeros_like(dqu_ref[0, 0])

    def _compute():
        q_blk, do_blk = q_ref[0], do_ref[0]
        if s % bq != 0:
            q_blk = _zero_oob_rows(q_blk, qb * bq, s)
            do_blk = _zero_oob_rows(do_blk, qb * bq, s)
        k_blk = k_ref[0]
        if s % bk != 0:
            # ds columns beyond s are zeroed, but 0 * garbage-K still
            # poisons the dq contraction -- zero the rows themselves
            k_blk = _zero_oob_rows(k_blk, kb * bk, s)
        scores = _dot(q_blk, k_blk, tb=True) * scale  # (bq, bk)
        valid = _valid_mask(scores.shape, qb * bq, kb * bk, s, causal)
        p = jnp.where(valid, jnp.exp(scores - lse_ref[0]), 0.0)
        dv_acc[...] += _dot(p.astype(do_blk.dtype), do_blk, ta=True)
        dp = _dot(do_blk, v_ref[0], tb=True)
        ds = jnp.where(valid, p * (dp - dcap_ref[0]), 0.0)
        dk_acc[...] += _dot(ds.astype(q_blk.dtype), q_blk, ta=True) * scale
        dqu_ref[0, 0] = (_dot(ds.astype(k_blk.dtype), k_blk) * scale
                         ).astype(dqu_ref.dtype)

    if causal:
        # a k block strictly above the q block's diagonal is all-masked:
        # skip the whole block pair's compute (~2x at long sequence)
        skip = kb * bk > (qb + 1) * bq - 1
        pl.when(skip)(_zero_dq)
        pl.when(jnp.logical_not(skip))(_compute)
    else:
        _compute()

    @pl.when(qb == nq - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dcap_ref, *rest,
                   scale, nk, bk, bq, s, causal, have_lens=False, window=0):
    if have_lens:
        lens_ref, dq_ref, acc_ref = rest
    else:
        dq_ref, acc_ref = rest
    qb, kb = pl.program_id(1), pl.program_id(2)
    limit = lens_ref[0, 0] if have_lens else s

    @pl.when(kb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def _compute():
        k_blk, v_blk = k_ref[0], v_ref[0]
        if s % bk != 0:
            k_blk = _zero_oob_rows(k_blk, kb * bk, s)
            v_blk = _zero_oob_rows(v_blk, kb * bk, s)
        scores = _dot(q_ref[0], k_blk, tb=True) * scale
        valid = _valid_mask(scores.shape, qb * bq, kb * bk, limit,
                            causal, window)
        p = jnp.where(valid, jnp.exp(scores - lse_ref[0]), 0.0)
        dp = _dot(do_ref[0], v_blk, tb=True)
        ds = p * (dp - dcap_ref[0])
        acc_ref[...] += _dot(ds.astype(k_blk.dtype), k_blk) * scale

    if (causal and _BWD_SKIP) or window:
        # all-masked pairs (above diagonal / below band) add nothing to the
        # dq accumulator: skip the 3 GEMMs (same trick as the forward)
        pl.when(_pair_relevant(qb, bq, kb, bk, causal, window))(_compute)
    else:
        _compute()

    @pl.when(kb == nk - 1)
    def _():
        dq_ref[0] = acc_ref[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dcap_ref, *rest,
                    scale, nq, nq_inner, bk, bq, s, causal, have_lens=False,
                    window=0):
    """``nq`` is the TOTAL inner-grid length; under GQA it is
    groups * nq_inner -- the inner index walks the (query head of the
    group, q block) pairs, so ``qb`` (the mask-relevant q-block index
    within one head's sequence) is ``it % nq_inner``."""
    if have_lens:
        lens_ref, dk_ref, dv_ref, dk_acc, dv_acc = rest
    else:
        dk_ref, dv_ref, dk_acc, dv_acc = rest
    kb, it = pl.program_id(1), pl.program_id(2)
    qb = it % nq_inner
    limit = lens_ref[0, 0] if have_lens else s

    @pl.when(it == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    def _compute():
        q_blk, do_blk = q_ref[0], do_ref[0]
        if s % bq != 0:
            q_blk = _zero_oob_rows(q_blk, qb * bq, s)
            do_blk = _zero_oob_rows(do_blk, qb * bq, s)
        scores = _dot(q_blk, k_ref[0], tb=True) * scale  # (bq, bk)
        valid = _valid_mask(scores.shape, qb * bq, kb * bk, limit,
                            causal, window)
        p = jnp.where(valid, jnp.exp(scores - lse_ref[0]), 0.0)
        dv_acc[...] += _dot(p.astype(do_blk.dtype), do_blk, ta=True)
        dp = _dot(do_blk, v_ref[0], tb=True)
        ds = jnp.where(valid, p * (dp - dcap_ref[0]), 0.0)
        dk_acc[...] += _dot(ds.astype(q_blk.dtype), q_blk, ta=True) * scale

    if (causal and _BWD_SKIP) or window:
        pl.when(_pair_relevant(qb, bq, kb, bk, causal, window))(_compute)
    else:
        _compute()

    @pl.when(it == nq - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


# Backward scheme selector (A/B harness hook, benchmarks/flash_tune.py --ab).
# MEASURED (r3, in-session A/B at 2048 tokens bf16): the two-pass scheme WINS
# -- 23.9% vs 19.0% MFU at d=64 and 38.5% vs 18.2% at d=128 -- because the
# fused kernel's unreduced per-k-block dq slabs ((nk, b, s, d) f32 written to
# HBM then summed by XLA) cost more bandwidth than the two-pass scheme's one
# extra score recompute.  Kept for A/B and for shapes where nk is tiny.
_FUSED_BWD = False


def set_flash_fused(on: bool):
    global _FUSED_BWD
    prev = _FUSED_BWD
    _FUSED_BWD = on
    _build.cache_clear()
    return prev


def _flash_bwd_fused(g, q, k, v, lse, dcap, scale, causal, vma=None):
    """One kernel for all three grads + an XLA sum over the dq slabs."""
    b, s, d = q.shape
    bq, bk = _attn_blocks(s)
    nq, nk = cdiv(s, bq), cdiv(s, bk)
    row = lambda h, j, i: (h, i, 0)
    col = lambda h, j, i: (h, j, 0)
    q_spec = lambda w: pl.BlockSpec((1, bq, w), row, memory_space=pltpu.VMEM)
    k_spec = lambda w: pl.BlockSpec((1, bk, w), col, memory_space=pltpu.VMEM)
    dqu_spec = pl.BlockSpec((1, 1, bq, d), lambda h, j, i: (j, h, i, 0),
                            memory_space=pltpu.VMEM)
    sds = functools.partial(jax.ShapeDtypeStruct,
                            **({} if vma is None else {"vma": vma}))
    dqu, dk, dv = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, scale=scale, nq=nq, bk=bk,
                          bq=bq, s=s, causal=causal),
        grid=(b, nk, nq),
        in_specs=[q_spec(d), k_spec(d), k_spec(d), q_spec(d), q_spec(1),
                  q_spec(1)],
        out_specs=[dqu_spec, k_spec(d), k_spec(d)],
        out_shape=[
            sds((nk, b, s, d), jnp.float32),
            sds((b, s, d), k.dtype),
            sds((b, s, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        interpret=interpret(),
    )(q, k, v, g, lse, dcap)
    return jnp.sum(dqu, axis=0).astype(q.dtype), dk, dv


# optional per-pass backward block overrides: the dq pass (k streams) and
# the dk/dv pass (q streams) have different reuse patterns, so their optima
# can differ from the forward's.  None -> use _attn_blocks (the fwd shape).
_BWD_DQ_BLOCKS = None
_BWD_DKV_BLOCKS = None


def set_flash_bwd_blocks(dq=None, dkv=None):
    """Override (bq, bk) separately for the two backward passes
    (tuning-harness hook, benchmarks/flash_tune.py --per-pass)."""
    global _BWD_DQ_BLOCKS, _BWD_DKV_BLOCKS
    prev = (_BWD_DQ_BLOCKS, _BWD_DKV_BLOCKS)
    _BWD_DQ_BLOCKS, _BWD_DKV_BLOCKS = dq, dkv
    _build.cache_clear()
    return prev


def _flash_bwd(g, q, k, v, out, lse, scale, causal, dlse=None, vma=None,
               lengths=None, window=0):
    b, s, d = q.shape
    groups = b // k.shape[0]
    assert b == k.shape[0] * groups, (q.shape, k.shape)
    bq, bk = _attn_blocks(s)
    nq, nk = cdiv(s, bq), cdiv(s, bk)
    # D_i = rowsum(dO * O): one cheap fused elementwise+reduce in XLA.
    # When the caller also consumes the lse output (blockwise/ring merges),
    # its cotangent enters every score as ds += p * dlse, i.e. D -> D - dlse.
    dcap = jnp.sum(g * out, axis=-1, keepdims=True).astype(jnp.float32)
    if dlse is not None:
        dcap = dcap - dlse.astype(jnp.float32)

    have_lens = lengths is not None
    if _FUSED_BWD and not have_lens and not window and groups == 1:
        # lengths/window/GQA stay on the two-pass scheme (the measured
        # production winner; the fused A/B variant is kept plain)
        return _flash_bwd_fused(g, q, k, v, lse, dcap, scale, causal, vma=vma)

    sds = functools.partial(jax.ShapeDtypeStruct, **({} if vma is None else {"vma": vma}))
    lens2d = (jnp.asarray(lengths, jnp.int32).reshape(b, 1)
              if have_lens else None)

    bq1, bk1 = _BWD_DQ_BLOCKS or (bq, bk)
    nq1, nk1 = cdiv(s, bq1), cdiv(s, bk1)
    row = lambda h, i, j: (h, i, 0)
    col = ((lambda h, i, j: (h // groups, j, 0)) if groups > 1
           else (lambda h, i, j: (h, j, 0)))
    row_spec = lambda w: pl.BlockSpec((1, bq1, w), row, memory_space=pltpu.VMEM)
    col_spec = lambda w: pl.BlockSpec((1, bk1, w), col, memory_space=pltpu.VMEM)
    in_specs = [row_spec(d), col_spec(d), col_spec(d), row_spec(d),
                row_spec(1), row_spec(1)]
    args = [q, k, v, g, lse, dcap]
    if have_lens:
        in_specs.append(_lens_spec())
        args.append(lens2d)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, nk=nk1, bk=bk1,
                          bq=bq1, s=s, causal=causal, have_lens=have_lens,
                          window=window),
        grid=(b, nq1, nk1),
        in_specs=in_specs,
        out_specs=row_spec(d),
        out_shape=sds((b, s, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq1, d), jnp.float32)],
        interpret=interpret(),
    )(*args)

    # second pass: swap the roles -- k blocks are resident, q streams.
    # GQA: the grid batches over KV rows and the inner index walks the
    # (group, q block) pairs of that KV head -- dk/dv accumulate over ALL
    # G query heads in VMEM scratch and come out (B/G, S, D) directly (the
    # gather-expand path needed an XLA scatter-add to get there).
    bq2, bk2 = _BWD_DKV_BLOCKS or (bq, bk)
    nq2, nk2 = cdiv(s, bq2), cdiv(s, bk2)
    bkv = k.shape[0]
    krow = lambda h, j, i: (h * groups + i // nq2, i % nq2, 0)
    kcol = lambda h, j, i: (h, j, 0)
    q_spec = lambda w: pl.BlockSpec((1, bq2, w), krow, memory_space=pltpu.VMEM)
    k_spec = lambda w: pl.BlockSpec((1, bk2, w), kcol, memory_space=pltpu.VMEM)
    in_specs = [q_spec(d), k_spec(d), k_spec(d), q_spec(d), q_spec(1),
                q_spec(1)]
    args = [q, k, v, g, lse, dcap]
    if have_lens:
        in_specs.append(pl.BlockSpec(
            (1, 1), lambda h, j, i: (h * groups + i // nq2, 0),
            memory_space=pltpu.VMEM))
        args.append(lens2d)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, nq=groups * nq2,
                          nq_inner=nq2, bk=bk2, bq=bq2, s=s, causal=causal,
                          have_lens=have_lens, window=window),
        grid=(bkv, nk2, groups * nq2),
        in_specs=in_specs,
        out_specs=[k_spec(d), k_spec(d)],
        out_shape=[
            sds((bkv, s, d), k.dtype),
            sds((bkv, s, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk2, d), jnp.float32),
            pltpu.VMEM((bk2, d), jnp.float32),
        ],
        interpret=interpret(),
    )(*args)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# mode dispatch
# ---------------------------------------------------------------------------
def _causal_mask(s, window=0):
    row = jnp.arange(s)[:, None]
    col = jnp.arange(s)[None, :]
    ok = col <= row
    if window:
        ok = jnp.logical_and(ok, row - col < window)
    return jnp.where(ok, 0.0, _NEG_INF).astype(jnp.float32)


def _len_masks(lengths, b, s):
    """(b,) lengths -> (col additive mask (b, 1, s), row validity (b, s, 1))."""
    lens = jnp.asarray(lengths, jnp.int32).reshape(b, 1)
    col = jnp.where(jnp.arange(s)[None, :] < lens, 0.0, _NEG_INF)
    row = (jnp.arange(s)[None, :] < lens)[..., None]
    return col[:, None, :], row


def _attn_fwd_impl(q, k, v, scale, mode, causal=False, with_res=False,
                   lengths=None, window=0):
    shape = q.shape  # (..., S, D); k/v may carry fewer heads (GQA)
    s, d = shape[-2], shape[-1]
    b = prod(shape[:-2])
    bkv = prod(k.shape[:-2])
    groups = b // bkv
    q3 = q.reshape(b, s, d)
    k3, v3 = (x.reshape(bkv, s, d) for x in (k, v))
    if mode == "xla":
        # grouped form: the g axis is a free lhs dim, so XLA lowers this to
        # one batched GEMM per KV head WITHOUT materializing repeated K/V
        q4 = q3.reshape(bkv, groups, s, d)
        scores = jnp.einsum("bgqd,bkd->bgqk", q4, k3,
                            precision=_prec_for(q4, k3)) * scale
        if causal:
            # cast the mask to the score dtype: an f32 mask would silently
            # upcast scores -- and through the residual stream the ENTIRE
            # rest of a bf16 model (measured: AMP GPT ran f32 past layer 1)
            scores = scores + _causal_mask(s, window).astype(scores.dtype)
        if lengths is not None:
            colm, rowv = _len_masks(lengths, b, s)
            colm = colm.reshape(bkv, groups, 1, s)
            rowv = rowv.reshape(bkv, groups, s, 1)
            scores = scores + colm.astype(scores.dtype)
        p = jax.nn.softmax(scores, axis=-1)
        if lengths is not None:
            # padded query rows softmaxed all -NEG_INF -> NaN: zero them
            # (same contract as the pallas path)
            p = jnp.where(rowv, p, 0.0).astype(p.dtype)
        out = jnp.einsum("bgqk,bkd->bgqd", p, v3, precision=_prec_for(v3)
                         ).reshape(shape)
        if not with_res:
            return out
        lse = jax.scipy.special.logsumexp(scores, axis=-1, keepdims=True)
        if lengths is not None:
            lse = jnp.where(rowv, lse, 0.0)
        return out, lse.reshape(b, s, 1)
    out, lse = _flash_fwd(q3, k3, v3, scale, causal, lengths=lengths,
                          window=window)
    return (out.reshape(shape), lse) if with_res else out.reshape(shape)


def _attn_bwd_impl(g, q, k, v, out, lse, scale, mode, causal=False,
                   lengths=None, window=0):
    shape, kshape = q.shape, k.shape
    s, d = shape[-2], shape[-1]
    b = prod(shape[:-2])
    bkv = prod(kshape[:-2])
    groups = b // bkv
    g3, q3 = (x.reshape(b, s, d) for x in (g, q))
    k3, v3 = (x.reshape(bkv, s, d) for x in (k, v))
    if mode == "pallas" and out is not None and lse is not None:
        dq, dk, dv = _flash_bwd(g3, q3, k3, v3, out.reshape(b, s, d), lse,
                                scale, causal, lengths=lengths, window=window)
        return dq.reshape(shape), dk.reshape(kshape), dv.reshape(kshape)
    # recompute path (one fused XLA program); grouped einsums keep K/V
    # unexpanded and reduce dk/dv over the group axis in the GEMM itself
    g4, q4 = g3.reshape(bkv, groups, s, d), q3.reshape(bkv, groups, s, d)
    scores = jnp.einsum("bgqd,bkd->bgqk", q4, k3,
                        precision=_prec_for(q4, k3)) * scale
    if causal:
        scores = scores + _causal_mask(s, window).astype(scores.dtype)
    if lengths is not None:
        colm, rowv = _len_masks(lengths, b, s)
        colm = colm.reshape(bkv, groups, 1, s)
        rowv = rowv.reshape(bkv, groups, s, 1)
        scores = scores + colm.astype(scores.dtype)
    p = jax.nn.softmax(scores, axis=-1)
    if lengths is not None:
        p = jnp.where(rowv, p, 0.0).astype(p.dtype)
    dv = jnp.einsum("bgqk,bgqd->bkd", p, g4, precision=_prec_for(g4))
    dp = jnp.einsum("bgqd,bkd->bgqk", g4, v3, precision=_prec_for(g4, v3))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bgqk,bkd->bgqd", ds, k3, precision=_prec_for(k3)) * scale
    dk = jnp.einsum("bgqk,bgqd->bkd", ds, q4, precision=_prec_for(q4)) * scale
    return dq.reshape(shape), dk.reshape(kshape), dv.reshape(kshape)


@functools.lru_cache(maxsize=None)
def _build(which, scale, mode, causal, have_lens=False, window=0):
    if which == "bwd":
        impl = functools.partial(_attn_bwd_impl, scale=scale, mode=mode,
                                 causal=causal, window=window)
    else:
        impl = functools.partial(
            _attn_fwd_impl, scale=scale, mode=mode, causal=causal,
            with_res=(which == "fwd_res"), window=window,
        )
    return jax.jit(impl)


# jax-differentiable attention: pallas kernels have no automatic
# differentiation rule, so anything running attention under jax.vjp/jax.grad
# (scan-over-layers, module_stages pipelines, plain jax callers) needs this
# custom VJP.  The lse output's cotangent is honored on the pallas path (the
# dcap shift in _flash_bwd); the tape op discards lse so it is zero there.
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _attn_res(q, k, v, scale, causal, mode, window=0):
    return _build("fwd_res", scale, mode, causal, window=window)(q, k, v)


def _attn_res_fwd(q, k, v, scale, causal, mode, window=0):
    out, lse = _build("fwd_res", scale, mode, causal, window=window)(q, k, v)
    return (out, lse), (q, k, v, out, lse)


def _attn_res_bwd(scale, causal, mode, window, res, cts):
    q, k, v, out, lse = res
    g, glse = cts
    if mode == "pallas":
        shape, kshape = q.shape, k.shape
        s, d = shape[-2], shape[-1]
        b = prod(shape[:-2])
        bkv = prod(kshape[:-2])
        dq, dk, dv = _flash_bwd(
            g.astype(q.dtype).reshape(b, s, d), q.reshape(b, s, d),
            k.reshape(bkv, s, d), v.reshape(bkv, s, d), out.reshape(b, s, d),
            lse.reshape(b, s, 1), scale, causal,
            dlse=glse.reshape(b, s, 1), window=window)
        return dq.reshape(shape), dk.reshape(kshape), dv.reshape(kshape)
    return _build("bwd", scale, mode, causal, window=window)(
        g, q, k, v, out, lse)


_attn_res.defvjp(_attn_res_fwd, _attn_res_bwd)


def attention_fwd(q, k, v, scale: float, causal: bool = False,
                  lengths=None, window: int = 0):
    if window:
        assert causal, "sliding window attention is causal-only"
    mode = resolve_mode("attention", seq=q.shape[-2])
    return _build("fwd", float(scale), mode, causal,
                  lengths is not None, window)(q, k, v, lengths=lengths)


def attention_fwd_res(q, k, v, scale: float, causal: bool = False,
                      lengths=None, window: int = 0):
    """Forward returning (out, lse) -- residuals for the flash backward.
    Differentiable under jax.vjp (custom VJP above).  ``lengths``: optional
    (B,) int32 per-example valid lengths (right-padded batches; no-grad).
    ``window``: sliding-window band (Mistral semantics -- position i attends
    to keys in [i-window+1, i]); causal-only, 0 disables."""
    if window:
        assert causal, "sliding window attention is causal-only"
    mode = resolve_mode("attention", seq=q.shape[-2])
    if lengths is not None:
        assert not window, "lengths + sliding window not supported together"
        return _attn_res_lens(q, k, v, jnp.asarray(lengths, jnp.int32),
                              float(scale), causal, mode)
    return _attn_res(q, k, v, float(scale), causal, mode, int(window))


# lengths-aware twin of _attn_res: lengths is a (non-differentiable) ARRAY
# argument, so it rides as a primal input whose cotangent is float0
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _attn_res_lens(q, k, v, lengths, scale, causal, mode):
    return _build("fwd_res", scale, mode, causal, True)(
        q, k, v, lengths=lengths)


def _attn_res_lens_fwd(q, k, v, lengths, scale, causal, mode):
    out, lse = _build("fwd_res", scale, mode, causal, True)(
        q, k, v, lengths=lengths)
    return (out, lse), (q, k, v, lengths, out, lse)


def _attn_res_lens_bwd(scale, causal, mode, res, cts):
    import numpy as _np

    q, k, v, lengths, out, lse = res
    g, glse = cts
    dlens = _np.zeros(lengths.shape, dtype=jax.dtypes.float0)
    if mode == "pallas":
        shape = q.shape
        s, d = shape[-2], shape[-1]
        b = prod(shape[:-2])
        dq, dk, dv = _flash_bwd(
            g.astype(q.dtype).reshape(b, s, d), q.reshape(b, s, d),
            k.reshape(b, s, d), v.reshape(b, s, d), out.reshape(b, s, d),
            lse.reshape(b, s, 1), scale, causal,
            dlse=glse.reshape(b, s, 1), lengths=lengths)
        return (dq.reshape(shape), dk.reshape(shape), dv.reshape(shape),
                dlens)
    dq, dk, dv = _build("bwd", scale, mode, causal, True)(
        g, q, k, v, out, lse, lengths=lengths)
    return dq, dk, dv, dlens


_attn_res_lens.defvjp(_attn_res_lens_fwd, _attn_res_lens_bwd)


def attention_bwd(g, q, k, v, scale: float, causal: bool = False,
                  out=None, lse=None, lengths=None, window: int = 0):
    mode = resolve_mode("attention", seq=q.shape[-2])
    return _build("bwd", float(scale), mode, causal, lengths is not None,
                  int(window))(g, q, k, v, out, lse, lengths=lengths)


# ---------------------------------------------------------------------------
# differentiable flash block: one (Q, K-chunk) flash pass returning (out, lse)
# with a custom VJP that also propagates the LSE cotangent.  This is the
# composable unit for blockwise/ring attention (parallel/ring_attention.py):
# the merge math consumes lse, so d_lse != 0 there -- handled by the
# dcap -> dcap - dlse shift in _flash_bwd.
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_block(q, k, v, scale, causal, vma=None):
    """(B, sq, D) x (B, sk, D) -> (out (B, sq, D), lse (B, sq, 1)).

    Differentiable in q/k/v including through the lse output.  ``vma``
    (hashable, e.g. frozenset of axis names) marks the mesh axes the
    outputs vary over when called inside a vma-checked ``shard_map``."""
    return _flash_fwd(q, k, v, scale, causal, vma=vma)


def _flash_block_fwd(q, k, v, scale, causal, vma):
    out, lse = _flash_fwd(q, k, v, scale, causal, vma=vma)
    return (out, lse), (q, k, v, out, lse)


def _flash_block_bwd(scale, causal, vma, res, cts):
    q, k, v, out, lse = res
    g, glse = cts
    dq, dk, dv = _flash_bwd(g.astype(q.dtype), q, k, v, out, lse,
                            scale, causal, dlse=glse, vma=vma)
    return dq, dk, dv


flash_block.defvjp(_flash_block_fwd, _flash_block_bwd)
