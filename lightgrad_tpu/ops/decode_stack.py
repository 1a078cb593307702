"""Whole-stack decode megakernel: every transformer layer of a single-token
decode step in ONE ``pallas_call``.

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

Slab schedule per layer (S = 4 + 2*R slabs, R = ffn_mult, GPT-2: R=4, S=12):

  s 0..2      qkv        y_s = LN1(x) @ Wqkv.T[:, s*d:(s+1)*d] + b
  s 3         attention  per-head softmax(q K^T) V over the cache window
                         (+ the just-computed self k/v, which are also
                         emitted to ``kv_out`` for the caller's single
                         cache dynamic_update_slice), then proj + residual
  s 4..4+R-1  fc         mlp_i = gelu(LN2(x) @ Wfc_i + b_i)
  s 4+R..S-1  fc2        acc += mlp_i @ Wfc2_i ; last: x += acc + b

Weights are packed once (``pack_gpt_stack``) into ``slabs (L, S, d, d)``
laid out so every GEMV is plain ``row @ slab``; int8 weight-only serving
packs int8 slabs + per-output-channel scales (halved DMA bytes; dequant
fuses into the slab's VMEM residency).

The reference has no decode path at all (lightgrad generates nothing);
this kernel exists for the serving story the TPU port adds.  Mosaic
constraint honored here: lane-splitting reshapes like (1, 768)->(12, 64)
are unsupported ("infer-vector-layout: unsupported shape cast"), so all
per-head math slices the flat (1, d) vectors at static 64-aligned lane
offsets instead.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .runtime import interpret

__all__ = ["pack_gpt_stack", "decode_stack"]

_NEG = -1e30


def _kernel_int8(pos_ref, x_ref, slab_ref, scale_ref, vec_ref, cache_ref,
                 xout_ref, kv_ref, hln, qkv, att, mlp, xacc, acc, **kw):
    """int8 variant: same body, with the slab's per-output-channel dequant
    scale row threaded into every GEMV."""
    _kernel_body(pos_ref, x_ref, slab_ref, vec_ref, cache_ref, xout_ref,
                 kv_ref, hln, qkv, att, mlp, xacc, acc,
                 scale_row=lambda: scale_ref[0, 0].astype(jnp.float32),
                 kvs_ref=None, **kw)


def _kernel_kvq(pos_ref, x_ref, slab_ref, vec_ref, cache_ref, kvs_ref,
                xout_ref, kv_ref, hln, qkv, att, mlp, xacc, acc, **kw):
    """int8 KV-cache variant: the cache block is int8 rows, ``kvs_ref`` the
    per-row f32 scales; dequant fuses into the score/context dot's operand
    read (scale the (W, hd) rows, never transpose the (W, 1) scale)."""
    _kernel_body(pos_ref, x_ref, slab_ref, vec_ref, cache_ref, xout_ref,
                 kv_ref, hln, qkv, att, mlp, xacc, acc,
                 scale_row=None, kvs_ref=kvs_ref, **kw)


def _kernel_int8_kvq(pos_ref, x_ref, slab_ref, scale_ref, vec_ref, cache_ref,
                     kvs_ref, xout_ref, kv_ref, hln, qkv, att, mlp, xacc,
                     acc, **kw):
    """int8 weights AND int8 KV cache composed (the long-context serving
    configuration: quantize_serving() + quantize_kv())."""
    _kernel_body(pos_ref, x_ref, slab_ref, vec_ref, cache_ref, xout_ref,
                 kv_ref, hln, qkv, att, mlp, xacc, acc,
                 scale_row=lambda: scale_ref[0, 0].astype(jnp.float32),
                 kvs_ref=kvs_ref, **kw)


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
    """One decode step through the whole layer stack.

    x: (1, d) compute-dtype residual input (embeddings already summed);
    cache: (L, 2, H, W, hd); pos: int32 scalar; slabs/vecs/scales from
    ``pack_gpt_stack``.  Returns ``(x_out (1, d), kv (L, 2, d))`` -- the
    caller scatters ``kv`` into the cache at row ``pos`` with one
    dynamic_update_slice (kernel outputs must not write dynamic rows of a
    revisited block, and one DUS for all L layers beats 12 in-step ones).

    ``kv_scales`` (L, 2, H, W, 1) f32 switches on the int8-KV-cache path
    (quantize_kv composed with the megakernel, VERDICT r4 next #3):
    ``cache`` is then the int8 row store, and the per-row dequant fuses
    into the score/context dots by scaling the (W, hd) row block -- never
    transposing the (W, 1) scale column, which Mosaic cannot shape-cast.
    The new token's own K/V row is attended at FULL precision (the
    unrolled fallback attends its freshly-quantized image -- a <=1-ULP-of-
    int8 difference on one attention term); the ``kv`` output stays full
    precision and the caller quantizes it with the same _q_rows formula
    the fallback uses, so the CACHE contents are identical between paths.
    """
    L, S, d, _ = slabs.shape
    _, _, H, W, hd = cache.shape
    scale = float(1.0 / np.sqrt(hd))
    int8 = scales is not None
    kvq = kv_scales is not None
    pos2d = jnp.asarray(pos, jnp.int32).reshape(1, 1)

    kern = functools.partial(
        (_kernel_int8_kvq if int8 else _kernel_kvq) if kvq
        else (_kernel_int8 if int8 else _kernel_noscale),
        L=L, S=S, R=R, H=H, hd=hd, eps=float(eps), scale=scale)

    in_specs = [
        pl.BlockSpec((1, 1), lambda l, s: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, d), lambda l, s: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d, d), lambda l, s: (l, s, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [pos2d, x, slabs]
    if int8:
        in_specs.append(pl.BlockSpec((1, 1, 1, d), lambda l, s: (l, s, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(scales)
    NV = vecs.shape[1]
    in_specs += [
        pl.BlockSpec((1, NV, d), lambda l, s: (l, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, H, W, hd), lambda l, s: (l, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args += [vecs, cache]
    if kvq:
        in_specs.append(pl.BlockSpec((1, 2, H, W, 1),
                                     lambda l, s: (l, 0, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(kv_scales)

    x_out, kv = pl.pallas_call(
        kern,
        grid=(L, S),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, d), lambda l, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, d), lambda l, s: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, d), x.dtype),
            # int8-KV: the kernel emits FULL-precision rows (the caller
            # quantizes + scatters); plain: rows in the cache dtype
            jax.ShapeDtypeStruct((L, 2, d), x.dtype if kvq else cache.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, d), jnp.float32),           # hln
            pltpu.VMEM((3, d), jnp.float32),           # qkv
            pltpu.VMEM((1, d), jnp.float32),           # att
            pltpu.VMEM((R, d), jnp.float32),           # mlp
            pltpu.VMEM((1, d), jnp.float32),           # xacc
            pltpu.VMEM((1, d), jnp.float32),           # acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret(),
    )(*args)
    return x_out, kv


def _kernel_noscale(pos_ref, x_ref, slab_ref, vec_ref, cache_ref,
                    xout_ref, kv_ref, hln, qkv, att, mlp, xacc, acc, **kw):
    _kernel_body(pos_ref, x_ref, slab_ref, vec_ref, cache_ref, xout_ref,
                 kv_ref, hln, qkv, att, mlp, xacc, acc, scale_row=None,
                 kvs_ref=None, **kw)


def _kernel_body(pos_ref, x_ref, slab_ref, vec_ref, cache_ref,
                 xout_ref, kv_ref, hln, qkv, att, mlp, xacc, acc, *,
                 scale_row, kvs_ref, L, S, R, H, hd, eps, scale):
    l = pl.program_id(0)
    s = pl.program_id(1)
    pos = pos_ref[0, 0]
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

    def gemv(row):
        """(1, d) f32 @ current slab -> (1, d) f32."""
        if scale_row is not None:
            w = slab_ref[0, 0].astype(jnp.bfloat16)
            y = jax.lax.dot_general(row.astype(jnp.bfloat16), w,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return y * scale_row()
        y = jax.lax.dot_general(row.astype(cdt), slab_ref[0, 0],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return y

    def bias(i):
        return vec[i:i + 1].astype(jnp.float32)

    @pl.when(s == 0)
    def _():
        hln[...] = layernorm(xacc[...], 0, 1)

    for i in range(3):
        @pl.when(s == i)
        def _(i=i):
            qkv[i:i + 1] = gemv(hln[...]) + bias(6 + i)

    @pl.when(s == 3)
    def _():
        kv_ref[0, 0:1] = qkv[1:2].astype(kv_ref.dtype)
        kv_ref[0, 1:2] = qkv[2:3].astype(kv_ref.dtype)
        W = cache_ref.shape[3]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        seen = col < pos                               # strictly-before rows
        for h in range(H):
            sl = slice(h * hd, (h + 1) * hd)
            qh = qkv[0:1, sl]
            kh = qkv[1:2, sl]
            vh = qkv[2:3, sl]
            if kvs_ref is not None:
                # int8 rows x (W, 1) f32 scales: dequant fuses into the
                # dot's operand read (row-scale the (W, hd) block; a
                # (W, 1)->(1, W) transpose of the scale is an unsupported
                # Mosaic shape cast).  f32 dots: the int8 path trades MXU
                # rate for HBM bytes, and W x hd per head is tiny.
                kch = cache_ref[0, 0, h].astype(jnp.float32) \
                    * kvs_ref[0, 0, h]
                vch = cache_ref[0, 1, h].astype(jnp.float32) \
                    * kvs_ref[0, 1, h]
            else:
                kch = cache_ref[0, 0, h]               # (W, hd)
                vch = cache_ref[0, 1, h]
            sc = jax.lax.dot_general(
                qh if kvs_ref is not None else qh.astype(cdt), kch,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            sc = jnp.where(seen, sc, _NEG)
            s_self = jnp.sum(qh * kh, -1, keepdims=True) * scale
            m = jnp.maximum(jnp.max(sc, -1, keepdims=True), s_self)
            pc = jnp.exp(sc - m)
            ps = jnp.exp(s_self - m)
            denom = jnp.sum(pc, -1, keepdims=True) + ps
            ctx = jax.lax.dot_general(
                pc if kvs_ref is not None else pc.astype(cdt), vch,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            att[0:1, sl] = (ctx + ps * vh) / denom
        xacc[...] = xacc[...] + gemv(att[...]) + bias(4)

    @pl.when(s == 4)
    def _():
        hln[...] = layernorm(xacc[...], 2, 3)

    for i in range(R):
        @pl.when(s == 4 + i)
        def _(i=i):
            y = gemv(hln[...]) + bias(9 + i)
            mlp[i:i + 1] = 0.5 * y * (
                1.0 + jnp.tanh(0.7978845608028654 * (y + 0.044715 * y ** 3)))

    for i in range(R):
        @pl.when(s == 4 + R + i)
        def _(i=i):
            y = gemv(mlp[i:i + 1])
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
