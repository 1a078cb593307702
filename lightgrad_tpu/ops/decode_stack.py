"""Whole-stack decode megakernel: 1..n tokens through every transformer
layer of a decode step in ONE ``pallas_call``.

Why.  The per-token cost of the device-loop decode splits into weight
streaming (which already runs near HBM peak) and a FIXED floor that is
independent of weight bytes -- measured ~0.58 ms/token on GPT-2-small
(benchmarks/decode_budget.py, r4: f32 1.273 / bf16 0.925 / int8 0.784
ms/token fits ``F + bytes/B`` with B~713-880 GB/s and F~0.58 ms).  The floor
is the ~110 thunk launches of 12 unrolled layers x ~9 small ops.  This
kernel replaces all of them with ONE program: grid ``(L, S)`` walks layers
and weight slabs, Pallas's block pipeline streams each (d, d) slab
HBM->VMEM (double-buffered, so the DMA engine never idles -- the kernel is
DMA-bound by design), and the activation state lives in VMEM scratch that
persists across grid steps.

``n > 1`` rows serve the speculative-verify / multi-token ``extend`` pass:
the n tokens at positions pos..pos+n-1 ride the SAME weight stream (one
weight pass for n tokens -- the term that makes speculative decoding pay),
with an in-kernel (n, n) causal self-block attending the rows' own
freshly-computed K/V (measured r5: the unrolled XLA extend's thunk floor
made speculative decode 0.77x of megakernel-plain; this kernel is the fix).

Slab schedule per layer (grid S = 3 + C + 2*R steps, weight slabs
S_w = 4 + 2*R, R = ffn_mult; GPT-2: R=4):

  s 0..2        qkv        y_s = LN1(x) @ Wqkv.T[:, s*d:(s+1)*d] + b
  s 3..3+C-1    attention  per-head ONLINE softmax over the cache window
                           in C chunks of W/C rows (running max /
                           denominator / context in VMEM scratch -- the
                           flash-attention recurrence), seeded by the
                           (n, n) causal self-block.  The first chunk step
                           also emits the n K/V rows to ``kv_out`` (the
                           caller scatters them with one cache
                           dynamic_update_slice); the last chunk step
                           normalizes, then proj + residual.
  s ..+R-1      fc         mlp_i = gelu(LN2(x) @ Wfc_i + b_i)
  s ..+R        fc2        acc += mlp_i @ Wfc2_i ; last: x += acc + b

Chunking exists because the whole (2, H, W, hd) per-layer cache block must
otherwise be VMEM-resident: at W=2048 bf16 that is 12.6 MB AFTER Mosaic's
lane padding (hd=64 pads to 128 lanes) and double-buffering pushes the
scoped allocation past the 16 MB VMEM limit (measured compile failure,
r5).  ``_plan_chunks`` picks the smallest power-of-two C whose padded
working set fits ``_VMEM_BUDGET``; ``stack_fits`` exposes the same test to
the model wiring so an unfittable config falls back to the unrolled path
instead of failing at compile time.

``pos`` rides as a SCALAR-PREFETCH operand (PrefetchScalarGridSpec), so
the cache/scale index maps can see it: chunks whose first row is already
>= pos are fully masked anyway, and their block index clamps to the last
needed chunk -- Pallas re-fetches a block only when its index CHANGES, so
skipped chunks cost ZERO DMA and decode streams O(pos) cache bytes, not
O(W).  Weight-slab index maps revisit slab 3 across all C attention steps
(one fetch), and the qkv steps of layer l keep layer l-1's last cache
block resident so every needed (layer, chunk) block is fetched exactly
once per token.

Weights are packed once (``pack_gpt_stack``) into ``slabs (L, S_w, d, d)``
laid out so every GEMV is plain ``row @ slab``; int8 weight-only serving
packs int8 slabs + per-output-channel scales (halved DMA bytes; dequant
fuses into the slab's VMEM residency).

The reference has no decode path at all (lightgrad generates nothing);
this kernel exists for the serving story the TPU port adds.  Mosaic
constraints honored here: lane-splitting reshapes like (1, 768)->(12, 64)
are unsupported ("infer-vector-layout: unsupported shape cast"), so all
per-head math slices the flat (n, d) vectors at static 64-aligned lane
offsets; a (W, 1) f32 block pads to (W, 128) lanes -- 128x VMEM waste --
so the int8-KV row scales are blocked LANE-major as (1, 2, H, Wc) and
applied to the (n, Wc) score/probability rows (mathematically identical:
the K scale multiplies the score column, the V scale folds into the
softmax probabilities) instead of dequantizing (Wc, hd) row blocks.
Per-head online-softmax stats live broadcast across the head's hd lanes
(single-lane slices at arbitrary offsets are not lane-sliceable).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .runtime import interpret

__all__ = ["pack_gpt_stack", "decode_stack", "decode_stack_batch",
           "stack_fits"]

_NEG = -1e30
# Scoped-VMEM target for the kernel's double-buffered working set.  The
# hardware limit is 16 MB; the compiler's own bookkeeping takes a slice,
# and the measured r5 failure (26.32 MB request vs 16 MB) calibrates the
# padding model below, so leave ~3 MB of headroom.
_VMEM_BUDGET = 13 * 1024 * 1024


def _pad(n, m):
    return ((n + m - 1) // m) * m


def _sublane(dtype):
    """Mosaic VMEM tile sublane count by element width (lane count 128)."""
    return {4: 8, 2: 16, 1: 32}[jnp.dtype(dtype).itemsize]


def _working_set_bytes(Wc, *, d, H, hd, NV, cache_dt, w_dt, int8, kvq, R,
                       n=1, batch=1):
    """Padded VMEM bytes of the kernel's streamed blocks (x2 for Pallas
    double buffering) plus resident scratch, for one cache chunk of Wc.
    ``batch`` > 1: the batched kernel keeps every slot's chunk resident."""
    isz = jnp.dtype(cache_dt).itemsize
    wsz = jnp.dtype(w_dt).itemsize
    cache_b = batch * 2 * H * _pad(Wc, _sublane(cache_dt)) \
        * _pad(hd, 128) * isz
    kvs_b = batch * 2 * _pad(H, 8) * _pad(Wc, 128) * 4 if kvq else 0
    slab_b = _pad(d, _sublane(w_dt)) * _pad(d, 128) * wsz
    wscale_b = 8 * _pad(d, 128) * 4 if int8 else 0
    vec_b = _pad(NV, _sublane(w_dt)) * _pad(d, 128) * wsz
    streamed = cache_b + kvs_b + slab_b + wscale_b + vec_b
    # hln/q/k/v/att/xacc/acc/mrun/drun (n rows each) + mlp (R*n rows)
    scratch_b = (9 + R) * _pad(n, 8) * _pad(d, 128) * 4
    return 2 * streamed + scratch_b


def _plan_chunks(W, **kw):
    """Smallest power-of-two chunk count C whose working set fits.
    Returns C or None (no fit -> caller must use the fallback path).
    C > 1 requires (W/C) % 128 == 0 when the int8-KV scale operand rides
    along (its chunked block's lane dim is Wc, and a non-full lane dim
    must be a multiple of 128); otherwise (W/C) % 8 == 0 (cache block
    sublane rule)."""
    align = 128 if kw.get("kvq") else 8
    C = 1
    while C <= W:
        Wc = W // C
        if W % C == 0 and (C == 1 or Wc % align == 0):
            if _working_set_bytes(Wc, **kw) <= _VMEM_BUDGET:
                return C
        C *= 2
    return None


def stack_fits(*, W, d, H, hd, R, cache_dt, w_dt, int8=False, kvq=False,
               n=8, batch=1):
    """True if some chunking of the (2, H, W, hd) cache fits VMEM -- the
    model wiring consults this BEFORE packing slabs so an unfittable
    config (odd W with a huge window) falls back to the unrolled decode
    instead of dying inside the XLA->Mosaic compile.  ``n=8`` sizes the
    scratch for the largest multi-row extend the packed stack may serve;
    ``batch`` sizes the batched kernel's per-slot chunk residency."""
    NV = 6 + 3 + R
    return _plan_chunks(W, d=d, H=H, hd=hd, NV=NV, cache_dt=cache_dt,
                        w_dt=w_dt, int8=int8, kvq=kvq, R=R, n=n,
                        batch=batch) is not None


def _kernel_int8(pos_ref, x_ref, slab_ref, scale_ref, vec_ref, cache_ref,
                 xout_ref, kv_ref, *scratch, **kw):
    """int8 variant: same body, with the slab's per-output-channel dequant
    scale row threaded into every GEMM."""
    _kernel_body(pos_ref, x_ref, slab_ref, vec_ref, cache_ref, xout_ref,
                 kv_ref, *scratch,
                 scale_row=lambda: scale_ref[0, 0].astype(jnp.float32),
                 kvs_ref=None, **kw)


def _kernel_kvq(pos_ref, x_ref, slab_ref, vec_ref, cache_ref, kvs_ref,
                xout_ref, kv_ref, *scratch, **kw):
    """int8 KV-cache variant: the cache block is int8 rows, ``kvs_ref``
    the per-row f32 scales blocked lane-major (1, 2, H, Wc)."""
    _kernel_body(pos_ref, x_ref, slab_ref, vec_ref, cache_ref, xout_ref,
                 kv_ref, *scratch, scale_row=None, kvs_ref=kvs_ref, **kw)


def _kernel_int8_kvq(pos_ref, x_ref, slab_ref, scale_ref, vec_ref, cache_ref,
                     kvs_ref, xout_ref, kv_ref, *scratch, **kw):
    """int8 weights AND int8 KV cache composed (the long-context serving
    configuration: quantize_serving() + quantize_kv())."""
    _kernel_body(pos_ref, x_ref, slab_ref, vec_ref, cache_ref, xout_ref,
                 kv_ref, *scratch,
                 scale_row=lambda: scale_ref[0, 0].astype(jnp.float32),
                 kvs_ref=kvs_ref, **kw)


def _kernel_noscale(pos_ref, x_ref, slab_ref, vec_ref, cache_ref,
                    xout_ref, kv_ref, *scratch, **kw):
    _kernel_body(pos_ref, x_ref, slab_ref, vec_ref, cache_ref, xout_ref,
                 kv_ref, *scratch, scale_row=None, kvs_ref=None, **kw)


# batched-slot variants: one extra (n, 1) VMEM operand carries the
# per-slot positions (the scalar-prefetch vector serves the index maps;
# vector masking needs the positions as lanes)
def _kernel_b_noscale(pos_ref, x_ref, slab_ref, vec_ref, cache_ref,
                      posv_ref, xout_ref, kv_ref, *scratch, **kw):
    _kernel_body(pos_ref, x_ref, slab_ref, vec_ref, cache_ref, xout_ref,
                 kv_ref, *scratch, scale_row=None, kvs_ref=None,
                 posv_ref=posv_ref, **kw)


def _kernel_b_int8(pos_ref, x_ref, slab_ref, scale_ref, vec_ref, cache_ref,
                   posv_ref, xout_ref, kv_ref, *scratch, **kw):
    _kernel_body(pos_ref, x_ref, slab_ref, vec_ref, cache_ref, xout_ref,
                 kv_ref, *scratch,
                 scale_row=lambda: scale_ref[0, 0].astype(jnp.float32),
                 kvs_ref=None, posv_ref=posv_ref, **kw)


def _kernel_b_kvq(pos_ref, x_ref, slab_ref, vec_ref, cache_ref, kvs_ref,
                  posv_ref, xout_ref, kv_ref, *scratch, **kw):
    _kernel_body(pos_ref, x_ref, slab_ref, vec_ref, cache_ref, xout_ref,
                 kv_ref, *scratch, scale_row=None, kvs_ref=kvs_ref,
                 posv_ref=posv_ref, **kw)


def _kernel_b_int8_kvq(pos_ref, x_ref, slab_ref, scale_ref, vec_ref,
                       cache_ref, kvs_ref, posv_ref, xout_ref, kv_ref,
                       *scratch, **kw):
    _kernel_body(pos_ref, x_ref, slab_ref, vec_ref, cache_ref, xout_ref,
                 kv_ref, *scratch,
                 scale_row=lambda: scale_ref[0, 0].astype(jnp.float32),
                 kvs_ref=kvs_ref, posv_ref=posv_ref, **kw)


def pack_gpt_stack(p, L, d, R=4):
    """Pack per-layer GPT weights (``h.{l}.*`` names, torch (out, in)
    layout) into the megakernel's slab/vec arrays.  Detects int8 serving
    weights (``name#q``/``name#s`` pairs from quantize_serving) and emits
    int8 slabs + per-output-channel scales."""
    S = 4 + 2 * R
    NV = 6 + 3 + R
    int8 = ("h.0.attn.c_attn.weight#q" in p)
    sfx = "#q" if int8 else ""

    def w(l, name):
        return p[f"h.{l}.{name}{sfx}"]

    slabs, vecs, scales = [], [], []
    for l in range(L):
        rows = []
        sc = []
        wqkv = w(l, "attn.c_attn.weight")              # (3d, d)
        for i in range(3):
            rows.append(wqkv[i * d:(i + 1) * d].T)
        rows.append(w(l, "attn.c_proj.weight").T)      # (d, d)
        wfc = w(l, "c_fc.weight")                      # (Rd, d)
        for i in range(R):
            rows.append(wfc[i * d:(i + 1) * d].T)
        wfc2 = w(l, "c_proj.weight")                   # (d, Rd)
        for i in range(R):
            rows.append(wfc2[:, i * d:(i + 1) * d].T)
        slabs.append(jnp.stack(rows))
        if int8:
            sq = p[f"h.{l}.attn.c_attn.weight#s"]
            sp = p[f"h.{l}.attn.c_proj.weight#s"]
            sf = p[f"h.{l}.c_fc.weight#s"]
            s2 = p[f"h.{l}.c_proj.weight#s"]
            sc = [sq[i * d:(i + 1) * d] for i in range(3)] + [sp] \
                + [sf[i * d:(i + 1) * d] for i in range(R)] \
                + [s2] * R
            scales.append(jnp.stack([s.astype(jnp.float32) for s in sc]))
        bq = p[f"h.{l}.attn.c_attn.bias"]
        bf = p[f"h.{l}.c_fc.bias"]
        vr = [p[f"h.{l}.ln_1.weight"], p[f"h.{l}.ln_1.bias"],
              p[f"h.{l}.ln_2.weight"], p[f"h.{l}.ln_2.bias"],
              p[f"h.{l}.attn.c_proj.bias"], p[f"h.{l}.c_proj.bias"]] \
            + [bq[i * d:(i + 1) * d] for i in range(3)] \
            + [bf[i * d:(i + 1) * d] for i in range(R)]
        vecs.append(jnp.stack(vr))
    out = {"stack#slabs": jnp.stack(slabs), "stack#vecs": jnp.stack(vecs)}
    if int8:
        # (L, S, 1, d): Mosaic requires the last TWO block dims be
        # (multiple-of-8, multiple-of-128) or the full array dims -- a
        # (1, 1, d) block over (L, S, d) violates the sublane rule
        out["stack#scales"] = jnp.stack(scales)[:, :, None, :]
    assert out["stack#vecs"].shape[1] == NV
    assert out["stack#slabs"].shape[1] == S
    return out


def decode_stack(x, cache, pos, slabs, vecs, scales=None, *, eps, R=4,
                 kv_scales=None):
    """n decode tokens (n static, usually 1) through the whole layer stack.

    x: (n, d) compute-dtype residual input (embeddings already summed) for
    positions pos..pos+n-1; cache: (L, 2, H, W, hd); pos: int32 scalar;
    slabs/vecs/scales from ``pack_gpt_stack``.  Returns ``(x_out (n, d),
    kv (L, 2, n, d))`` -- the caller scatters ``kv`` into the cache rows
    pos..pos+n-1 with one dynamic_update_slice (kernel outputs must not
    write dynamic rows of a revisited block, and one DUS for all L layers
    beats L in-step ones).  Cache rows < pos are attended by every token;
    rows among the n in-flight tokens attend each other causally through
    the in-kernel self-block (exact ``extend`` semantics).

    ``kv_scales`` (L, 2, H, W, 1) f32 switches on the int8-KV-cache path
    (quantize_kv composed with the megakernel, VERDICT r4 next #3):
    ``cache`` is then the int8 row store, and the per-row dequant fuses
    into the score/context dots -- the K scale multiplies the (n, Wc)
    score rows, the V scale folds into the probabilities (never touching a
    (W, 1) block, which pads to 128 lanes in VMEM).  The in-flight rows'
    own K/V are attended at FULL precision (the unrolled fallback attends
    their freshly-quantized image -- a <=1-ULP-of-int8 difference on the
    self-block terms); the ``kv`` output stays full precision and the
    caller quantizes it with the same _q_rows formula the fallback uses,
    so the CACHE contents are identical between paths.
    """
    n, _ = x.shape
    L, S, d, _ = slabs.shape
    _, _, H, W, hd = cache.shape
    scale = float(1.0 / np.sqrt(hd))
    int8 = scales is not None
    kvq = kv_scales is not None
    NV = vecs.shape[1]
    C = _plan_chunks(W, d=d, H=H, hd=hd, NV=NV, cache_dt=cache.dtype,
                     w_dt=slabs.dtype, int8=int8, kvq=kvq, R=R, n=n)
    if C is None:
        raise ValueError(
            f"decode_stack: no cache chunking of W={W} fits VMEM "
            f"(gate with stack_fits() before packing)")
    Wc = W // C
    SG = 3 + C + 2 * R                                 # grid steps per layer
    pos1 = jnp.asarray(pos, jnp.int32).reshape(1)

    kern = functools.partial(
        (_kernel_int8_kvq if int8 else _kernel_kvq) if kvq
        else (_kernel_int8 if int8 else _kernel_noscale),
        L=L, S=SG, C=C, Wc=Wc, R=R, H=H, hd=hd, n=n, eps=float(eps),
        scale=scale)

    def slab_idx(s):
        # s<3 -> s; attention chunks -> 3 (proj slab, fetched once);
        # fc/fc2 -> s - (C-1)
        return jnp.minimum(s, 3) + jnp.maximum(s - (2 + C), 0)

    def last_chunk(pref):
        # Last chunk index holding any visible row (rows < pos); chunk 0
        # is always "needed" (it hosts the init/emit step).
        return jnp.maximum((pref[0] + Wc - 1) // Wc, 1) - 1

    def cache_map(l, s, pref):
        last = last_chunk(pref)
        c_att = jnp.clip(s - 3, 0, last)
        is_qkv = s < 3
        cc = jnp.where(is_qkv, jnp.where(l > 0, last, 0),
                       jnp.where(s >= 3 + C, last, c_att))
        lq = jnp.where(is_qkv & (l > 0), l - 1, l)
        return (lq, 0, 0, cc, 0)

    def kvs_map(l, s, pref):
        lq, _, _, cc, _ = cache_map(l, s, pref)
        return (lq, 0, 0, cc)

    in_specs = [
        pl.BlockSpec((n, d), lambda l, s, pref: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d, d), lambda l, s, pref: (l, slab_idx(s), 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, slabs]
    if int8:
        in_specs.append(pl.BlockSpec(
            (1, 1, 1, d), lambda l, s, pref: (l, slab_idx(s), 0, 0),
            memory_space=pltpu.VMEM))
        args.append(scales)
    in_specs += [
        pl.BlockSpec((1, NV, d), lambda l, s, pref: (l, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, H, Wc, hd), cache_map, memory_space=pltpu.VMEM),
    ]
    args += [vecs, cache]
    if kvq:
        # (L, 2, H, W, 1) -> (L, 2, H, W): lane-major so the chunked block
        # is (1, 2, H, Wc) -- W on lanes, zero padding waste
        in_specs.append(pl.BlockSpec((1, 2, H, Wc), kvs_map,
                                     memory_space=pltpu.VMEM))
        args.append(kv_scales.reshape(L, 2, H, W))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, SG),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((n, d), lambda l, s, pref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, n, d), lambda l, s, pref: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, d), jnp.float32),           # hln
            pltpu.VMEM((n, d), jnp.float32),           # q
            pltpu.VMEM((n, d), jnp.float32),           # k
            pltpu.VMEM((n, d), jnp.float32),           # v
            pltpu.VMEM((n, d), jnp.float32),           # att (ctx accum)
            pltpu.VMEM((R * n, d), jnp.float32),       # mlp
            pltpu.VMEM((n, d), jnp.float32),           # xacc
            pltpu.VMEM((n, d), jnp.float32),           # acc
            # online-softmax running (max, denom) per head per row,
            # broadcast across the head's hd lanes: per-head slices stay
            # 64-aligned (single-lane slices at arbitrary offsets are not
            # Mosaic-lane-sliceable)
            pltpu.VMEM((n, d), jnp.float32),           # mrun
            pltpu.VMEM((n, d), jnp.float32),           # drun
        ],
    )
    x_out, kv = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, d), x.dtype),
            # int8-KV: the kernel emits FULL-precision rows (the caller
            # quantizes + scatters); plain: rows in the cache dtype
            jax.ShapeDtypeStruct((L, 2, n, d),
                                 x.dtype if kvq else cache.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret(),
    )(pos1, *args)
    return x_out, kv


def decode_stack_batch(x, cache, pos, slabs, vecs, scales=None, *, eps,
                       R=4, kv_scales=None):
    """B independent decode slots through the whole layer stack with ONE
    weight stream.

    ``jax.vmap`` of the single-slot kernel prepends a batch grid dim, so
    every slot re-streams all L x S weight slabs -- measured r4: batch-8
    aggregate decode was barely above single-stream (1320 vs 1139 tok/s)
    because decode is weight-read-bound.  Here the B slots ride the SAME
    slab pipeline: the qkv/fc GEMMs batch to (B, d) rows (better MXU
    occupancy too), and only the attention step walks per-slot cache
    blocks.  Weight traffic drops B-fold; the serving engine's tick is
    built on this.

    x: (B, d) rows, one per slot; cache: (B, L, 2, H, W, hd); pos: (B,)
    int32 per-slot positions.  Returns ``(x_out (B, d), kv (L, 2, B, d))``
    -- the caller scatters slot b's kv at row pos[b] (one vmapped
    dynamic_update_slice).  Slots are independent sequences: each attends
    its own cache rows < pos[b] plus its own new row (no cross-slot
    attention).  ``kv_scales`` (B, L, 2, H, W, 1) switches on the int8-KV
    path exactly as in ``decode_stack``.  The chunk-skip gate keys on
    max(pos): a tick whose slots are all early in their windows streams
    only the chunks any slot can see.
    """
    B, _ = x.shape
    L, S, d, _ = slabs.shape
    _, _, _, H, W, hd = cache.shape
    scale = float(1.0 / np.sqrt(hd))
    int8 = scales is not None
    kvq = kv_scales is not None
    NV = vecs.shape[1]
    C = _plan_chunks(W, d=d, H=H, hd=hd, NV=NV, cache_dt=cache.dtype,
                     w_dt=slabs.dtype, int8=int8, kvq=kvq, R=R, n=B,
                     batch=B)
    if C is None:
        raise ValueError(
            f"decode_stack_batch: no cache chunking of W={W} x B={B} fits "
            f"VMEM (gate with stack_fits(batch=...) before packing)")
    Wc = W // C
    SG = 3 + C + 2 * R
    posb = jnp.asarray(pos, jnp.int32).reshape(B)

    kern = functools.partial(
        (_kernel_b_int8_kvq if int8 else _kernel_b_kvq) if kvq
        else (_kernel_b_int8 if int8 else _kernel_b_noscale),
        L=L, S=SG, C=C, Wc=Wc, R=R, H=H, hd=hd, n=B, eps=float(eps),
        scale=scale)

    def slab_idx(s):
        return jnp.minimum(s, 3) + jnp.maximum(s - (2 + C), 0)

    def last_chunk(pref):
        mx = functools.reduce(jnp.maximum, [pref[b] for b in range(B)])
        return jnp.maximum((mx + Wc - 1) // Wc, 1) - 1

    def cache_map(l, s, pref):
        last = last_chunk(pref)
        c_att = jnp.clip(s - 3, 0, last)
        is_qkv = s < 3
        cc = jnp.where(is_qkv, jnp.where(l > 0, last, 0),
                       jnp.where(s >= 3 + C, last, c_att))
        lq = jnp.where(is_qkv & (l > 0), l - 1, l)
        return (0, lq, 0, 0, cc, 0)

    def kvs_map(l, s, pref):
        _, lq, _, _, cc, _ = cache_map(l, s, pref)
        return (0, lq, 0, 0, cc)

    in_specs = [
        pl.BlockSpec((B, d), lambda l, s, pref: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d, d), lambda l, s, pref: (l, slab_idx(s), 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, slabs]
    if int8:
        in_specs.append(pl.BlockSpec(
            (1, 1, 1, d), lambda l, s, pref: (l, slab_idx(s), 0, 0),
            memory_space=pltpu.VMEM))
        args.append(scales)
    in_specs += [
        pl.BlockSpec((1, NV, d), lambda l, s, pref: (l, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, 1, 2, H, Wc, hd), cache_map,
                     memory_space=pltpu.VMEM),
    ]
    args += [vecs, cache]
    if kvq:
        in_specs.append(pl.BlockSpec((B, 1, 2, H, Wc), kvs_map,
                                     memory_space=pltpu.VMEM))
        args.append(kv_scales.reshape(B, L, 2, H, W))
    in_specs.append(pl.BlockSpec((B, 1), lambda l, s, pref: (0, 0),
                                 memory_space=pltpu.VMEM))
    args.append(posb.reshape(B, 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, SG),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((B, d), lambda l, s, pref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, B, d), lambda l, s, pref: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, d), jnp.float32),           # hln
            pltpu.VMEM((B, d), jnp.float32),           # q
            pltpu.VMEM((B, d), jnp.float32),           # k
            pltpu.VMEM((B, d), jnp.float32),           # v
            pltpu.VMEM((B, d), jnp.float32),           # att
            pltpu.VMEM((R * B, d), jnp.float32),       # mlp
            pltpu.VMEM((B, d), jnp.float32),           # xacc
            pltpu.VMEM((B, d), jnp.float32),           # acc
            pltpu.VMEM((B, d), jnp.float32),           # mrun
            pltpu.VMEM((B, d), jnp.float32),           # drun
        ],
    )
    x_out, kv = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, d), x.dtype),
            jax.ShapeDtypeStruct((L, 2, B, d),
                                 x.dtype if kvq else cache.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret(),
    )(posb, *args)
    return x_out, kv


def _kernel_body(pos_ref, x_ref, slab_ref, vec_ref, cache_ref,
                 xout_ref, kv_ref, hln, qs, ks, vs, att, mlp, xacc, acc,
                 mrun, drun, *, scale_row, kvs_ref, L, S, C, Wc, R, H, hd,
                 n, eps, scale, posv_ref=None):
    batched = posv_ref is not None
    l = pl.program_id(0)
    s = pl.program_id(1)
    if batched:
        # n independent slots, each at its own position: the DMA/compute
        # gate keys on the furthest slot (per-slot masking handles the
        # rest -- a chunk beyond slot b's pos contributes exp(-inf)=0)
        pos = functools.reduce(jnp.maximum,
                               [pos_ref[b] for b in range(n)])
    else:
        pos = pos_ref[0]
    cdt = x_ref.dtype
    vec = vec_ref[0]                                   # (NV, d) cdt

    @pl.when((l == 0) & (s == 0))
    def _():
        xacc[...] = x_ref[...].astype(jnp.float32)

    def layernorm(v, wi, bi):
        m = jnp.mean(v, -1, keepdims=True)
        var = jnp.mean((v - m) ** 2, -1, keepdims=True)
        w = vec[wi:wi + 1].astype(jnp.float32)
        b = vec[bi:bi + 1].astype(jnp.float32)
        return (v - m) * jax.lax.rsqrt(var + eps) * w + b

    def gemm(rows):
        """(n, d) f32 @ current slab -> (n, d) f32."""
        if scale_row is not None:
            w = slab_ref[0, 0].astype(jnp.bfloat16)
            y = jax.lax.dot_general(rows.astype(jnp.bfloat16), w,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return y * scale_row()
        y = jax.lax.dot_general(rows.astype(cdt), slab_ref[0, 0],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return y

    def bias(i):
        return vec[i:i + 1].astype(jnp.float32)

    @pl.when(s == 0)
    def _():
        hln[...] = layernorm(xacc[...], 0, 1)

    for i, dst in enumerate((qs, ks, vs)):
        @pl.when(s == i)
        def _(i=i, dst=dst):
            dst[...] = gemm(hln[...]) + bias(6 + i)

    # --- attention: C chunk steps with the online-softmax recurrence ---
    in_att = (s >= 3) & (s < 3 + C)
    c = s - 3
    base = c * Wc

    @pl.when(in_att)
    def _():
        @pl.when(c == 0)
        def _():
            # emit the n k/v rows; seed the recurrence with the self
            # attention terms at full precision.  Sequential rows (extend
            # mode): an (n, n) causal block -- in-flight rows attend each
            # other.  Batched slots: each slot attends ONLY its own row
            # (slots are independent sequences).
            kv_ref[0, 0] = ks[...].astype(kv_ref.dtype)
            kv_ref[0, 1] = vs[...].astype(kv_ref.dtype)
            if batched:
                for h in range(H):
                    sl = slice(h * hd, (h + 1) * hd)
                    s_self = jnp.sum(qs[:, sl] * ks[:, sl], -1,
                                     keepdims=True) * scale     # (n, 1)
                    mrun[:, sl] = jnp.broadcast_to(s_self, (n, hd))
                    drun[:, sl] = jnp.ones((n, hd), jnp.float32)
                    att[:, sl] = vs[:, sl]
            else:
                ri = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
                ci = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
                vis = ci <= ri
                for h in range(H):
                    sl = slice(h * hd, (h + 1) * hd)
                    ss = jax.lax.dot_general(
                        qs[:, sl], ks[:, sl], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale
                    ss = jnp.where(vis, ss, _NEG)      # (n, n)
                    m0 = jnp.max(ss, -1, keepdims=True)
                    p0 = jnp.exp(ss - m0)
                    mrun[:, sl] = jnp.broadcast_to(m0, (n, hd))
                    drun[:, sl] = jnp.broadcast_to(
                        jnp.sum(p0, -1, keepdims=True), (n, hd))
                    att[:, sl] = jax.lax.dot_general(
                        p0, vs[:, sl], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

        # Process this chunk's cache block.  Cache rows < pos are visible
        # to ALL n in-flight rows (rows >= pos are stale; in-flight
        # interactions ride the self-block above).  Chunks whose first
        # row is beyond pos are fully masked AND their block index was
        # clamped by the index map (the block ref holds an already-
        # visited chunk) -- skip them entirely: zero DMA, zero compute.
        @pl.when((c == 0) | (base < pos))
        def _():
            col = base + jax.lax.broadcasted_iota(jnp.int32, (1, Wc), 1)
            # strictly-before rows; batched: per-slot positions broadcast
            # (n, 1) against the column row
            seen = col < (posv_ref[...] if batched else pos)
            for h in range(H):
                sl = slice(h * hd, (h + 1) * hd)
                qh = qs[:, sl]                         # (n, hd) f32

                def _score(q2, kc2):
                    if kvs_ref is not None:
                        # int8 rows: dequant rides the (n, Wc) score /
                        # probability ROWS (K scale on the score columns,
                        # V scale folded into the probabilities) -- O(Wc)
                        # extra work, no (Wc, hd) dequant materialization.
                        # f32 dots: int8 trades MXU rate for HBM bytes,
                        # and Wc x hd per head is tiny.
                        return jax.lax.dot_general(
                            q2, kc2.astype(jnp.float32),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
                    return jax.lax.dot_general(
                        q2.astype(cdt), kc2,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale

                if batched:
                    # each slot scores against ITS OWN cache chunk; the
                    # stats/softmax math below stays fully vectorized
                    sc = jnp.concatenate(
                        [_score(qs[b:b + 1, sl], cache_ref[b, 0, 0, h])
                         for b in range(n)], axis=0)   # (n, Wc)
                    if kvs_ref is not None:
                        sc = sc * kvs_ref[:, 0, 0, h]
                else:
                    kch = cache_ref[0, 0, h]           # (Wc, hd)
                    sc = _score(qh, kch)
                    if kvs_ref is not None:
                        sc = sc * kvs_ref[0, 0, h:h + 1]
                sc = jnp.where(seen, sc, _NEG)         # (n, Wc)
                # stats lanes within a head all hold the same value; a
                # keepdims max reads them back as (n, 1)
                m_old = jnp.max(mrun[:, sl], -1, keepdims=True)
                den_old = jnp.max(drun[:, sl], -1, keepdims=True)
                m_new = jnp.maximum(m_old, jnp.max(sc, -1, keepdims=True))
                corr = jnp.exp(m_old - m_new)
                pc = jnp.exp(sc - m_new)               # (n, Wc)
                mrun[:, sl] = jnp.broadcast_to(m_new, (n, hd))
                drun[:, sl] = jnp.broadcast_to(
                    den_old * corr + jnp.sum(pc, -1, keepdims=True),
                    (n, hd))

                def _context(p2, vc2):
                    if kvs_ref is not None:
                        return jax.lax.dot_general(
                            p2, vc2.astype(jnp.float32),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    return jax.lax.dot_general(
                        p2.astype(cdt), vc2,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

                if batched:
                    pv = pc * kvs_ref[:, 0, 1, h] if kvs_ref is not None \
                        else pc
                    ctx = jnp.concatenate(
                        [_context(pv[b:b + 1], cache_ref[b, 0, 1, h])
                         for b in range(n)], axis=0)   # (n, hd)
                else:
                    vch = cache_ref[0, 1, h]
                    pv = pc * kvs_ref[0, 1, h:h + 1] if kvs_ref is not None \
                        else pc
                    ctx = _context(pv, vch)
                att[:, sl] = att[:, sl] * corr + ctx

        @pl.when(c == C - 1)
        def _():
            # normalize, then proj + residual (slab index 3 is resident
            # across every attention chunk step)
            for h in range(H):
                sl = slice(h * hd, (h + 1) * hd)
                den = jnp.max(drun[:, sl], -1, keepdims=True)
                att[:, sl] = att[:, sl] / den
            xacc[...] = xacc[...] + gemm(att[...]) + bias(4)

    @pl.when(s == 3 + C)
    def _():
        hln[...] = layernorm(xacc[...], 2, 3)

    for i in range(R):
        @pl.when(s == 3 + C + i)
        def _(i=i):
            y = gemm(hln[...]) + bias(9 + i)
            mlp[i * n:(i + 1) * n] = 0.5 * y * (
                1.0 + jnp.tanh(0.7978845608028654 * (y + 0.044715 * y ** 3)))

    for i in range(R):
        @pl.when(s == 3 + C + R + i)
        def _(i=i):
            y = gemm(mlp[i * n:(i + 1) * n])
            if i == 0:
                acc[...] = y
            else:
                acc[...] = acc[...] + y

    @pl.when(s == S - 1)
    def _():
        xacc[...] = xacc[...] + acc[...] + bias(5)

    @pl.when((l == L - 1) & (s == S - 1))
    def _():
        xout_ref[...] = xacc[...].astype(cdt)
