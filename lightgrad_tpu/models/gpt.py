"""GPT-2 family: causal-LM transformer with flash attention.

A second model family beyond the reference's BERT example: pre-LN GPT-2
architecture (token+position embeddings, causal self-attention via the fused
flash kernel, gelu MLP, weight-tied LM head), HuggingFace GPT-2 checkpoint
import (HF stores Conv1D weights as (in, out) -- transposed here), byte-level
BPE tokenizer with an offline byte fallback, and autoregressive generation.
"""

import json

import numpy as np

import lightgrad_tpu.nn as nn
from lightgrad_tpu.autograd import Tensor, no_grad

__all__ = ["GPTConfig", "GPT", "GPT2Tokenizer", "ByteTokenizer"]


class _NotJaxBacked(TypeError):
    """Parameters are not jax arrays; KV-cache decode unavailable."""


def _sample(logits: np.ndarray, temperature: float, rng,
            top_k: int = 0, top_p: float = 0.0,
            repetition_penalty: float = 1.0, prev_ids=None) -> int:
    """Greedy (temperature<=0) or temperature sampling, optionally truncated
    to the top-k logits and/or the top-p (nucleus) probability mass.
    ``repetition_penalty`` > 1 damps logits of already-emitted ids (CTRL,
    Keskar et al.): positive logits divided by the penalty, negative ones
    multiplied."""
    logits = np.array(logits, np.float32)  # owned copy: np.asarray of a jax
    # array is a read-only view, and the penalty writes in place
    if repetition_penalty != 1.0 and prev_ids:
        seen = np.asarray(sorted(set(int(i) for i in prev_ids)))
        seen = seen[seen < len(logits)]
        vals = logits[seen]
        logits[seen] = np.where(vals > 0, vals / repetition_penalty,
                                vals * repetition_penalty)
    if temperature <= 0:
        return int(np.argmax(logits))
    if top_k and top_k < len(logits):
        kth = np.partition(logits, -top_k)[-top_k]
        logits = np.where(logits < kth, -np.inf, logits)
    z = (logits - logits.max()) / temperature
    prob = np.exp(z)
    prob /= prob.sum()
    if 0.0 < top_p < 1.0:
        order = np.argsort(-prob)
        keep_sorted = np.cumsum(prob[order]) - prob[order] < top_p  # always >=1
        keep = np.zeros_like(prob, dtype=bool)
        keep[order[keep_sorted]] = True
        prob = np.where(keep, prob, 0.0)
        prob /= prob.sum()
    return int(rng.choice(len(prob), p=prob))


class GPTConfig:
    def __init__(self, vocab_size=50257, n_positions=1024, n_embd=768,
                 n_layer=12, n_head=12, layer_norm_epsilon=1e-5,
                 scan_layers=False, remat=False, n_experts=0, moe_every=1,
                 moe_k=2, moe_dispatch="topk", moe_hidden=None,
                 moe_capacity_factor=1.25, moe_shared=0, **unused):
        self.vocab_size = vocab_size
        self.n_positions = n_positions
        self.n_embd = n_embd
        self.n_layer = n_layer
        self.n_head = n_head
        self.layer_norm_epsilon = layer_norm_epsilon
        # scan_layers: hold the L blocks as stacked (L, ...) parameters and
        # apply them with one lax.scan (O(1) compile size in depth --
        # lightgrad_tpu/scan.py); remat additionally rematerializes block
        # activations in backward: True/"full" recomputes the whole block
        # (+1 forward of compute), "dots" saves GEMM outputs and recomputes
        # only the elementwise ops between them (near-zero FLOP overhead;
        # see scan._remat_wrap)
        self.scan_layers = scan_layers
        self.remat = remat
        # Mixture-of-experts variant (Switch/Mixtral-style; framework
        # extension -- the reference has no MoE).  ``n_experts > 0`` replaces
        # the dense FFN of every ``moe_every``-th block with an nn.MoE of
        # ``n_experts`` experts (Mixtral: every block; Switch: every other,
        # ``moe_every=2``).  Expert weights are stacked ``(E, d, h)`` so they
        # shard over an ``ep`` mesh axis (parallel.GPT_MOE_RULES).
        self.n_experts = n_experts
        self.moe_every = moe_every
        self.moe_k = moe_k
        self.moe_dispatch = moe_dispatch
        self.moe_hidden = moe_hidden if moe_hidden is not None else 4 * n_embd
        self.moe_capacity_factor = moe_capacity_factor
        self.moe_shared = moe_shared
        if n_experts and scan_layers:
            raise ValueError(
                "scan_layers requires a homogeneous block stack; MoE blocks "
                "carry per-forward aux_loss state the scan cannot thread -- "
                "use scan_layers=False with n_experts")


class CausalSelfAttention(nn.Module):
    def __init__(self, cfg: GPTConfig):
        super().__init__()
        self.n_head = cfg.n_head
        self.head_dim = cfg.n_embd // cfg.n_head
        self.c_attn = nn.Linear(cfg.n_embd, 3 * cfg.n_embd)
        self.c_proj = nn.Linear(cfg.n_embd, cfg.n_embd)

    def forward(self, x):
        b, s, h = x.shape
        qkv = self.c_attn(x)  # (b, s, 3h)
        qkv = qkv.reshape(b, s, 3, self.n_head, self.head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4)  # (3, b, heads, s, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        scale = 1.0 / np.sqrt(self.head_dim)
        sp = getattr(self, "_sequence_parallel", None)
        if sp is not None and hasattr(q, "ring_attention"):
            # sequence-parallel ring attention (parallel/ring_attention.py):
            # K/V shards rotate via ppermute, causal rounds for strictly-
            # future chunks are skipped.  Position embeddings were applied
            # on the global sequence upstream, so shards carry true offsets.
            mesh, axis, batch_axis = sp
            y = q.ring_attention(k, v, scale=scale, mesh=mesh, axis=axis,
                                 causal=True, batch_axis=batch_axis)
        elif hasattr(q, "attention"):
            y = q.attention(k, v, scale=scale, causal=True)
        else:
            scores = (q @ k.transpose(0, 1, 3, 2)) * scale
            mask = np.triu(np.full((s, s), -1e30, np.float32), k=1)
            scores = scores + type(x).from_numpy(mask, requires_grad=False)
            y = scores.softmax(axis=-1) @ v
        y = y.transpose(0, 2, 1, 3).reshape(b, s, h)
        return self.c_proj(y)


class GPTBlock(nn.Module):
    def __init__(self, cfg: GPTConfig, use_moe: bool = False):
        super().__init__()
        self.ln_1 = nn.LayerNorm(cfg.n_embd, eps=cfg.layer_norm_epsilon)
        self.attn = CausalSelfAttention(cfg)
        self.ln_2 = nn.LayerNorm(cfg.n_embd, eps=cfg.layer_norm_epsilon)
        if use_moe:
            # sparse FFN: router + stacked expert weights (nn.MoE); the
            # residual connection carries capacity-dropped tokens
            self.moe = nn.MoE(cfg.n_embd, cfg.moe_hidden, cfg.n_experts,
                              dispatch=cfg.moe_dispatch, k=cfg.moe_k,
                              capacity_factor=cfg.moe_capacity_factor,
                              n_shared=getattr(cfg, "moe_shared", 0))
        else:
            self.c_fc = nn.Linear(cfg.n_embd, 4 * cfg.n_embd)
            self.c_proj = nn.Linear(4 * cfg.n_embd, cfg.n_embd)

    def forward(self, x):
        x = x + self.attn(self.ln_1(x))
        if hasattr(self, "moe"):
            return x + self.moe(self.ln_2(x))
        return x + self.c_proj(self.c_fc(self.ln_2(x)).gelu())


class GPT(nn.Module):
    """GPT-2 causal language model (pre-LN, weight-tied LM head)."""

    def __init__(self, cfg: GPTConfig):
        super().__init__()
        self.cfg = cfg
        self.wte = nn.Embedding(cfg.vocab_size, cfg.n_embd)
        self.wpe = nn.Embedding(cfg.n_positions, cfg.n_embd)
        every = max(1, getattr(cfg, "moe_every", 1))
        blocks = [GPTBlock(cfg, use_moe=(cfg.n_experts > 0
                                         and i % every == every - 1))
                  for i in range(cfg.n_layer)]
        if getattr(cfg, "scan_layers", False):
            from lightgrad_tpu.scan import ScannedStack

            self.h = ScannedStack(blocks, remat=getattr(cfg, "remat", False))
        else:
            self.h = nn.ModuleList(*blocks)
        self.ln_f = nn.LayerNorm(cfg.n_embd, eps=cfg.layer_norm_epsilon)

    def forward(self, input_ids):
        b, s = input_ids.shape
        pos = Tensor.from_numpy(np.arange(s, dtype=np.int32), requires_grad=False)
        x = self.wte(input_ids) + self.wpe(pos)
        if isinstance(self.h, nn.ModuleList):
            for block in self.h:
                x = block(x)
        else:
            x = self.h(x)  # ScannedStack: one lax.scan over stacked layers
        # router load-balancing losses (set per-forward by nn.MoE topk/top1
        # dispatch): summed over MoE blocks; a plain attribute, never a
        # parameter.  Add ``model.aux_loss * weight`` to the training loss.
        aux = zl = None
        if isinstance(self.h, nn.ModuleList):
            for block in self.h:
                a = getattr(getattr(block, "moe", None), "aux_loss", None)
                if a is not None:
                    aux = a if aux is None else aux + a
                z = getattr(getattr(block, "moe", None), "z_loss", None)
                if z is not None:
                    zl = z if zl is None else zl + z
        object.__setattr__(self, "aux_loss", aux)
        object.__setattr__(self, "z_loss", zl)
        x = self.ln_f(x)
        # weight-tied LM head: logits = x @ wte^T
        return x @ self.wte.weight.T(1, 0)

    @no_grad()
    def generate(self, ids, max_new_tokens: int = 20, temperature: float = 0.0,
                 rng: np.random.Generator = None, use_cache: bool = True,
                 top_k: int = 0, top_p: float = 0.0, num_beams: int = 1,
                 eos_id: int = None, length_penalty: float = 1.0,
                 repetition_penalty: float = 1.0, stream=None):
        """Autoregressive decode; greedy when ``temperature=0``.

        ``use_cache=True`` (default, jax-backed tensors only): incremental
        decoding with a fixed-shape KV cache -- per-token cost is
        O(window * d) and independent of how many tokens were already
        emitted.  One compiled ``lax.scan`` prefills the prompt, one compiled
        single-token step decodes; both trace exactly once.

        ``use_cache=False``: full recompute of the right-padded
        ``n_positions`` window per token (the reference-parity path; under a
        causal mask right-padding cannot affect the last real position, so
        every step reuses ONE compiled shape) -- O(window^2 * d) per token.
        """
        ids = list(ids)
        rng = rng or np.random.default_rng(0)
        window = self.cfg.n_positions
        if num_beams > 1:
            from .decoding import beam_search

            assert temperature == 0.0, "beam search is deterministic"
            return beam_search(self, ids, max_new_tokens, beam_size=num_beams,
                               eos_id=eos_id, length_penalty=length_penalty)
        if use_cache:
            try:
                return self._generate_kv(ids, max_new_tokens, temperature, rng,
                                         top_k=top_k, top_p=top_p,
                                         repetition_penalty=repetition_penalty,
                                         stream=stream, eos_id=eos_id)
            except _NotJaxBacked:
                pass  # non-jax backend (e.g. CPU oracle tensors): recompute
        if not hasattr(self, "_decode_fn"):
            from lightgrad_tpu.jit import jit as _step_jit

            def _decode(x):
                with no_grad():
                    return self.forward(x)

            self._decode_fn = _step_jit(_decode)
        for _ in range(max_new_tokens):
            ctx = ids[-window:]
            padded = ctx + [0] * (window - len(ctx))
            x = Tensor.from_numpy(np.array([padded], dtype=np.int32), requires_grad=False)
            logits = self._decode_fn(x).numpy()[0, len(ctx) - 1]
            ids.append(_sample(logits, temperature, rng, top_k=top_k, top_p=top_p,
                               repetition_penalty=repetition_penalty,
                               prev_ids=ids))
            if stream is not None:
                stream(ids[-1])
            if eos_id is not None and ids[-1] == eos_id:
                break
        return ids

    # --- KV-cache incremental decoding (jax path) --------------------------
    def _kv_functions(self):
        """Build (init_cache, prefill_fn, step_fn) closing over parameter
        buffers.  The cache is one stacked array ``(L, 2, n_head, W, hd)``;
        each step writes the new K/V row at ``pos`` via dynamic_update_slice
        and attends the single query over the full fixed window under a
        ``<= pos`` mask, so XLA compiles exactly one program per function.
        """
        import jax
        import jax.numpy as jnp

        from lightgrad_tpu.ops.attention import attention_fwd as kattn_fwd
        from lightgrad_tpu.ops.decode_attention import (
            decode_attention as kdecode_attn)

        cfg = self.cfg
        H, hd, L, W = cfg.n_head, cfg.n_embd // cfg.n_head, cfg.n_layer, cfg.n_positions
        eps = cfg.layer_norm_epsilon
        p = {}
        for name, t in self.named_parameters():
            buf = t.data
            if not isinstance(buf, jnp.ndarray):
                raise _NotJaxBacked(type(buf).__name__)
            p[name] = buf
        if not isinstance(self.h, nn.ModuleList):
            # scanned stack: expose per-layer views under the flat h.{l}. names
            for l in range(L):
                for n, arr in self.h.layer_params(l).items():
                    p[f"h.{l}.{n}"] = arr
        # python float (weak-typed) so bf16 models stay bf16 end to end
        scale = float(1.0 / np.sqrt(hd))
        cdt = p["wte.weight"].dtype

        if getattr(self, "_serve_quant", False):
            # int8 weight-only serving (quantize_serving()): decode is
            # HBM-bound on weight reads (one token's GEMMs touch every
            # parameter), so storing the 7 per-layer matrices + the lm head
            # as per-output-channel symmetric int8 halves decode traffic
            # vs bf16.  The int8->compute-dtype convert fuses into the
            # dot's operand read; the (out,) scale lands on the GEMM
            # output -- the full-precision weight never rematerializes.
            big = [n for n in list(p)
                   if n.endswith(".weight") and p[n].ndim == 2
                   and n != "wte.weight" and not n.startswith("wpe")]
            for n in big:
                w = np.asarray(p.pop(n), np.float32)
                ws = np.maximum(np.abs(w).max(axis=1), 1e-8) / 127.0
                p[n + "#q"] = jnp.asarray(
                    np.clip(np.round(w / ws[:, None]), -127, 127), jnp.int8)
                p[n + "#s"] = jnp.asarray(ws, cdt)
            # the tied head reuses wte: quantize a separate serving copy
            w = np.asarray(p["wte.weight"], np.float32)
            ws = np.maximum(np.abs(w).max(axis=1), 1e-8) / 127.0
            p["head#q"] = jnp.asarray(
                np.clip(np.round(w / ws[:, None]), -127, 127), jnp.int8)
            p["head#s"] = jnp.asarray(ws, cdt)

        def mm(h, p, name):
            """h @ W.T where W may be stored int8 (weight-only serving)."""
            q = p.get(name + "#q")
            if q is None:
                return h @ p[name].T
            return (h @ q.T.astype(cdt)) * p[name + "#s"]

        def head_mm(x, p):
            if "head#q" in p:
                return (x @ p["head#q"].T.astype(cdt)) * p["head#s"]
            return x @ p["wte.weight"].T

        def ln(x, w, b):
            m = x.mean(-1, keepdims=True)
            v = ((x - m) ** 2).mean(-1, keepdims=True)
            return (x - m) / jnp.sqrt(v + eps) * w + b

        def gelu(x):
            return 0.5 * x * (1 + jnp.tanh(0.7978845608028654 * (x + 0.044715 * x**3)))

        # int8 KV cache (quantize_kv()): at long windows the KV read becomes
        # the decode bandwidth term (W x L x 2 x d bytes/token vs the fixed
        # weight bytes) -- store cache rows as per-row symmetric int8 with
        # f32 scales (scale overhead hd x smaller than the row).  The
        # int8->f32 convert fuses into the score/context dot's operand read;
        # the K scale lands on the score column, the V scale folds into the
        # softmax probabilities, so no dequantized cache ever materializes.
        kv_quant = bool(getattr(self, "_kv_quant", False))

        def _q_rows(kv):
            """(..., hd) rows -> (int8 rows, (..., 1) f32 scales)."""
            s = jnp.maximum(
                jnp.max(jnp.abs(kv.astype(jnp.float32)), -1, keepdims=True),
                1e-8) / 127.0
            q8 = jnp.clip(jnp.round(kv.astype(jnp.float32) / s),
                          -127, 127).astype(jnp.int8)
            return q8, s

        # Decode megakernel (ops/decode_stack.py): the whole L-layer step in
        # ONE pallas program.  The per-token cost of the unrolled XLA loop
        # is dominated by a ~0.58 ms fixed floor of ~110 small thunk
        # launches, independent of weight bytes (benchmarks/
        # decode_budget.py); the megakernel replaces them with one grid
        # that streams weight slabs HBM->VMEM double-buffered.  Packed
        # lazily here (a transposed slab copy of the layer weights) only
        # when the pallas kernel path is active at build time.
        from lightgrad_tpu.ops.runtime import kernel_mode as _kmode
        if (_kmode() != "xla" and cfg.n_experts == 0
                and hd % 8 == 0 and cfg.n_embd % 128 == 0):
            from lightgrad_tpu.ops.decode_stack import (pack_gpt_stack,
                                                        stack_fits)
            _int8w = "h.0.attn.c_attn.weight#q" in p
            _wdt = jnp.int8 if _int8w else p["h.0.attn.c_attn.weight"].dtype
            # VMEM fit gate: the kernel chunks the cache window, but an
            # unchunkable config (W not divisible into 128-row chunks, or
            # a working set that exceeds VMEM even at the finest chunking)
            # must fall back to the unrolled path instead of failing in
            # the Mosaic compile (measured r5: W=2048 bf16 OOMed at 26 MB
            # vs the 16 MB scoped limit before chunking existed)
            if stack_fits(W=W, d=cfg.n_embd, H=H, hd=hd, R=4,
                          cache_dt=jnp.int8 if kv_quant else cdt,
                          w_dt=_wdt, int8=_int8w, kvq=kv_quant):
                p.update(pack_gpt_stack(p, L, cfg.n_embd))

        def _write_and_attend(cache, l, q, k, v, pos):
            """Write layer ``l``'s new K/V row(s) at ``pos`` and attend.

            q/k/v: (H, n, hd) (n=1 for single-token decode).  Plain cache:
            ONE dynamic_update_slice straight into the stacked array (the
            slice/update/write-back idiom made XLA materialize full
            (H, W, hd) copies per layer -- 0.10 ms/token, decode_budget.py
            no_kv_write ablation), then the fused scores+mask+softmax+
            context kernel (ops/decode_attention.py).  int8 cache: quantize
            the new rows, then dequantize-in-dot -- the int8->f32 convert
            fuses into the dot's operand read, the K scale multiplies the
            score column, the V scale folds into the probabilities."""
            n = q.shape[1]
            if kv_quant:
                cq, cs = cache
                kvq, kvs = _q_rows(jnp.stack([k, v]))      # (2, H, n, hd)
                cq = jax.lax.dynamic_update_slice(
                    cq, kvq[None], (l, 0, 0, pos, 0))
                cs = jax.lax.dynamic_update_slice(
                    cs, kvs[None], (l, 0, 0, pos, 0))
                kq, ks = cq[l, 0], cs[l, 0]                # (H,W,hd),(H,W,1)
                vq, vs = cq[l, 1], cs[l, 1]
                s = jnp.einsum("hqd,hkd->hqk", q.astype(jnp.float32),
                               kq.astype(jnp.float32)) * scale
                s = s * ks[:, :, 0][:, None, :]
                rows = pos + jnp.arange(n, dtype=jnp.int32)
                ok = rows[None, :, None] >= \
                    jnp.arange(W, dtype=jnp.int32)[None, None, :]
                s = jnp.where(ok, s, -1e30)
                pr = jax.nn.softmax(s, axis=-1)
                pr = pr * vs[:, :, 0][:, None, :]
                att = jnp.einsum("hqk,hkd->hqd", pr, vq.astype(jnp.float32))
                att = att.astype(cdt)
                cache = (cq, cs)
            else:
                cache = jax.lax.dynamic_update_slice(
                    cache, jnp.stack([k, v])[None], (l, 0, 0, pos, 0))
                kc, vc = cache[l, 0], cache[l, 1]
                if n == 1:
                    att = kdecode_attn(q, kc, vc, pos, scale)
                else:
                    rows = pos + jnp.arange(n, dtype=jnp.int32)
                    vis = rows[None, :, None] >= \
                        jnp.arange(W, dtype=jnp.int32)[None, None, :]
                    s = jnp.einsum("hqd,hkd->hqk", q, kc) * scale
                    s = jnp.where(vis, s, -1e30)
                    att = jax.nn.softmax(s, axis=-1) @ vc
            att = att.transpose(1, 0, 2).reshape(n, H * hd)
            return cache, att

        def step(p, cache, pos, tok):
            """One token at position ``pos``: returns (cache, logits).

            ``p`` (the params dict) is a runtime argument, NOT a closure:
            closed-over weights embed as HLO constants and a GPT-2-small
            program would ship ~1 GB per remote compile (see
            decoding.ParamFn)."""
            x = p["wte.weight"][tok] + p["wpe.weight"][pos]      # (d,)
            x = x[None, :]                                       # (1, d)
            if "stack#slabs" in p:
                from lightgrad_tpu.ops.decode_stack import decode_stack
                if kv_quant:
                    # int8 KV THROUGH the megakernel (VERDICT r4 next #3:
                    # the two r4 flagship optimizations must compose):
                    # dequant fuses into the kernel's score/context dots;
                    # the emitted full-precision rows are quantized with
                    # the same _q_rows formula the fallback path uses, so
                    # cache contents are identical between paths
                    cq, cs = cache
                    x, kv = decode_stack(x, cq, pos, p["stack#slabs"],
                                         p["stack#vecs"],
                                         p.get("stack#scales"), eps=eps,
                                         kv_scales=cs)
                    kvq, kvs = _q_rows(kv.reshape(L, 2, H, hd))
                    cq = jax.lax.dynamic_update_slice(
                        cq, kvq[:, :, :, None, :], (0, 0, 0, pos, 0))
                    cs = jax.lax.dynamic_update_slice(
                        cs, kvs[:, :, :, None, :], (0, 0, 0, pos, 0))
                    cache = (cq, cs)
                else:
                    x, kv = decode_stack(x, cache, pos, p["stack#slabs"],
                                         p["stack#vecs"],
                                         p.get("stack#scales"), eps=eps)
                    # ONE scatter of every layer's new k/v row (the kernel
                    # cannot write a dynamic row of its revisited cache
                    # block)
                    cache = jax.lax.dynamic_update_slice(
                        cache, kv.reshape(L, 2, H, hd)[:, :, :, None, :],
                        (0, 0, 0, pos, 0))
                x = ln(x, p["ln_f.weight"], p["ln_f.bias"])
                return cache, head_mm(x, p)[0]                   # (vocab,)
            for l in range(L):
                pre = f"h.{l}."
                h = ln(x, p[pre + "ln_1.weight"], p[pre + "ln_1.bias"])
                qkv = mm(h, p, pre + "attn.c_attn.weight") \
                    + p[pre + "attn.c_attn.bias"]
                q, k, v = [a.reshape(H, 1, hd) for a in jnp.split(qkv[0], 3)]
                cache, att = _write_and_attend(cache, l, q, k, v, pos)
                x = x + mm(att, p, pre + "attn.c_proj.weight") \
                    + p[pre + "attn.c_proj.bias"]
                h2 = ln(x, p[pre + "ln_2.weight"], p[pre + "ln_2.bias"])
                h2 = gelu(mm(h2, p, pre + "c_fc.weight")
                          + p[pre + "c_fc.bias"])
                x = x + mm(h2, p, pre + "c_proj.weight") \
                    + p[pre + "c_proj.bias"]
            x = ln(x, p["ln_f.weight"], p["ln_f.bias"])
            return cache, head_mm(x, p)[0]                       # (vocab,)

        def init_cache():
            if kv_quant:
                return (jnp.zeros((L, 2, H, W, hd), jnp.int8),
                        jnp.zeros((L, 2, H, W, 1), jnp.float32))
            return jnp.zeros((L, 2, H, W, hd), dtype=p["wte.weight"].dtype)

        def prefill(p, cache, toks, n_real):
            """Bulk prefill: the prompt forward runs PARALLEL over positions
            (one (W, d) pass under a causal mask) and writes every K/V row
            at once.  The transformer forward has no sequential dependency
            over positions -- only decode does -- so prompt processing costs
            one batched pass instead of W sequential single-token steps
            (the scan formulation ran W tiny GEMMs back to back; this runs
            W-row GEMMs that actually occupy the MXU).  Pad rows beyond
            ``n_real`` hold garbage K/V but are unreachable: decode steps
            overwrite row ``pos`` before the ``<= pos`` mask exposes it."""
            x = p["wte.weight"][toks] + p["wpe.weight"][jnp.arange(W)]
            for l in range(L):
                pre = f"h.{l}."
                h = ln(x, p[pre + "ln_1.weight"], p[pre + "ln_1.bias"])
                qkv = mm(h, p, pre + "attn.c_attn.weight") \
                    + p[pre + "attn.c_attn.bias"]
                q, k, v = jnp.split(qkv, 3, axis=-1)             # (W, H*hd)
                q = q.reshape(W, H, hd).transpose(1, 0, 2)       # (H, W, hd)
                k = k.reshape(W, H, hd).transpose(1, 0, 2)
                v = v.reshape(W, H, hd).transpose(1, 0, 2)
                if kv_quant:
                    # quantize-on-write: the prefill pass itself attends the
                    # full-precision K/V it just computed; decode steps read
                    # the int8 rows
                    cq, cs = cache
                    kvq, kvs = _q_rows(jnp.stack([k, v]))
                    cache = (cq.at[l].set(kvq), cs.at[l].set(kvs))
                else:
                    cache = cache.at[l, 0].set(k).at[l, 1].set(v)
                # flash-attention prefill: the materializing einsum path
                # costs O(W^2) HBM per layer (H x W^2 scores = 100 MB/layer
                # at W=2048 bf16); attention_fwd streams it through VMEM
                # blocks (and resolves to the plain XLA softmax at small W
                # via the measured routing table)
                att = kattn_fwd(q, k, v, scale, causal=True)     # (H, W, hd)
                att = att.transpose(1, 0, 2).reshape(W, H * hd)
                x = x + mm(att, p, pre + "attn.c_proj.weight") \
                    + p[pre + "attn.c_proj.bias"]
                h2 = ln(x, p[pre + "ln_2.weight"], p[pre + "ln_2.bias"])
                h2 = gelu(mm(h2, p, pre + "c_fc.weight")
                          + p[pre + "c_fc.bias"])
                x = x + mm(h2, p, pre + "c_proj.weight") \
                    + p[pre + "c_proj.bias"]
            x = ln(x, p["ln_f.weight"], p["ln_f.bias"])
            return cache, head_mm(x[n_real - 1][None], p)[0]

        def step_batch(p, caches, poss, toks):
            """B independent decode slots in ONE program dispatch AND one
            weight stream (ops/decode_stack.decode_stack_batch): the
            ``vmap(step)`` lift re-streams all weights per slot -- decode
            is weight-read-bound, so batch-8 aggregate was barely above
            single-stream (measured r4/r5).  caches: (B, L, 2, H, W, hd)
            (or the (rows, scales) pair under quantize_kv); poss: (B,)
            int32; toks: (B,).  Returns (caches, logits (B, vocab)).
            Falls back to the vmapped unrolled step when the megakernel is
            not packed or the batched working set cannot fit VMEM."""
            B = toks.shape[0]
            from lightgrad_tpu.ops.decode_stack import (decode_stack_batch,
                                                        stack_fits)
            fits = "stack#slabs" in p and stack_fits(
                W=W, d=cfg.n_embd, H=H, hd=hd, R=4,
                cache_dt=jnp.int8 if kv_quant else cdt,
                w_dt=p["stack#slabs"].dtype if "stack#slabs" in p else cdt,
                int8="stack#scales" in p, kvq=kv_quant, n=B, batch=B)
            if not fits:
                return jax.vmap(step, in_axes=(None, 0, 0, 0))(
                    p, caches, poss, toks)
            x = p["wte.weight"][toks] + p["wpe.weight"][poss]    # (B, d)
            if kv_quant:
                cq, cs = caches
                x, kv = decode_stack_batch(x, cq, poss, p["stack#slabs"],
                                           p["stack#vecs"],
                                           p.get("stack#scales"), eps=eps,
                                           kv_scales=cs)
                # (L, 2, B, d) -> per-slot (B, L, 2, H, 1, hd) rows
                kvr = kv.reshape(L, 2, B, H, hd) \
                    .transpose(2, 0, 1, 3, 4)[:, :, :, :, None, :]
                kvq8, kvs = _q_rows(kvr)
                cq = jax.vmap(
                    lambda c, k, q: jax.lax.dynamic_update_slice(
                        c, k, (0, 0, 0, q, 0)))(cq, kvq8, poss)
                cs = jax.vmap(
                    lambda c, k, q: jax.lax.dynamic_update_slice(
                        c, k, (0, 0, 0, q, 0)))(cs, kvs, poss)
                caches = (cq, cs)
            else:
                x, kv = decode_stack_batch(x, caches, poss,
                                           p["stack#slabs"],
                                           p["stack#vecs"],
                                           p.get("stack#scales"), eps=eps)
                kvr = kv.reshape(L, 2, B, H, hd) \
                    .transpose(2, 0, 1, 3, 4)[:, :, :, :, None, :]
                caches = jax.vmap(
                    lambda c, k, q: jax.lax.dynamic_update_slice(
                        c, k, (0, 0, 0, q, 0)))(caches, kvr, poss)
            x = ln(x, p["ln_f.weight"], p["ln_f.bias"])
            return caches, head_mm(x, p)                         # (B, vocab)

        def extend(p, cache, pos0, toks):
            """Parallel multi-token decode: score ``toks`` (K rows, K static)
            at positions ``pos0..pos0+K-1`` in ONE batched pass -- the
            speculative-verify primitive.  Decode is weight-read-bound, so
            one weight pass serving K tokens costs ~one ``step``; the scan
            formulation paid K sequential steps, which makes speculative
            decoding structurally unable to beat plain decoding.  Row i
            attends cache keys ``<= pos0+i`` (its own K/V row is written
            first), preserving exact causal semantics; all K K/V rows land
            with one dynamic_update_slice per layer."""
            K = toks.shape[0]
            rows = pos0 + jnp.arange(K, dtype=jnp.int32)
            x = p["wte.weight"][toks] + p["wpe.weight"][rows]    # (K, d)
            if "stack#slabs" in p and K <= 8:
                # Megakernel extend: the K rows ride ONE weight-slab
                # stream (grid (L, S)), with the kernel's (K, K) causal
                # self-block covering the in-flight interactions.  The
                # unrolled loop below pays the ~L x 9-thunk fixed floor
                # that made speculative verify SLOWER than megakernel
                # plain decode (measured 0.77x, r5); this path restores
                # the one-weight-pass-per-round economics.  K <= 8 keeps
                # the kernel's row scratch within the packed fit gate.
                from lightgrad_tpu.ops.decode_stack import decode_stack
                if kv_quant:
                    cq, cs = cache
                    x, kv = decode_stack(x, cq, pos0, p["stack#slabs"],
                                         p["stack#vecs"],
                                         p.get("stack#scales"), eps=eps,
                                         kv_scales=cs)
                    kvr = kv.reshape(L, 2, K, H, hd).transpose(0, 1, 3, 2, 4)
                    kvq8, kvs = _q_rows(kvr)
                    cq = jax.lax.dynamic_update_slice(
                        cq, kvq8, (0, 0, 0, pos0, 0))
                    cs = jax.lax.dynamic_update_slice(
                        cs, kvs, (0, 0, 0, pos0, 0))
                    cache = (cq, cs)
                else:
                    x, kv = decode_stack(x, cache, pos0, p["stack#slabs"],
                                         p["stack#vecs"],
                                         p.get("stack#scales"), eps=eps)
                    kvr = kv.reshape(L, 2, K, H, hd).transpose(0, 1, 3, 2, 4)
                    cache = jax.lax.dynamic_update_slice(
                        cache, kvr, (0, 0, 0, pos0, 0))
                x = ln(x, p["ln_f.weight"], p["ln_f.bias"])
                return cache, head_mm(x, p)                      # (K, vocab)
            for l in range(L):
                pre = f"h.{l}."
                h = ln(x, p[pre + "ln_1.weight"], p[pre + "ln_1.bias"])
                qkv = mm(h, p, pre + "attn.c_attn.weight") \
                    + p[pre + "attn.c_attn.bias"]
                q, k, v = jnp.split(qkv, 3, axis=-1)             # (K, H*hd)
                q = q.reshape(K, H, hd).transpose(1, 0, 2)       # (H, K, hd)
                k = k.reshape(K, H, hd).transpose(1, 0, 2)
                v = v.reshape(K, H, hd).transpose(1, 0, 2)
                cache, att = _write_and_attend(cache, l, q, k, v, pos0)
                x = x + mm(att, p, pre + "attn.c_proj.weight") \
                    + p[pre + "attn.c_proj.bias"]
                h2 = ln(x, p[pre + "ln_2.weight"], p[pre + "ln_2.bias"])
                h2 = gelu(mm(h2, p, pre + "c_fc.weight")
                          + p[pre + "c_fc.bias"])
                x = x + mm(h2, p, pre + "c_proj.weight") \
                    + p[pre + "c_proj.bias"]
            x = ln(x, p["ln_f.weight"], p["ln_f.bias"])
            return cache, head_mm(x, p)                          # (K, vocab)

        from .decoding import KVFns, ParamFn

        return KVFns(init_cache, ParamFn(prefill, p), ParamFn(step, p),
                     ParamFn(extend, p), ParamFn(step_batch, p))

    def _generate_kv(self, ids, max_new_tokens, temperature, rng,
                     top_k: int = 0, top_p: float = 0.0,
                     repetition_penalty: float = 1.0, stream=None,
                     eos_id: int = None):
        import jax.numpy as jnp

        W = self.cfg.n_positions
        assert len(ids) + max_new_tokens <= W, (
            f"KV-cache decode needs prompt+new <= n_positions "
            f"({len(ids)}+{max_new_tokens} > {W}); use use_cache=False for "
            f"sliding-window recompute"
        )
        if not hasattr(self, "_kv_fns"):
            self._kv_fns = self._kv_functions()
        init_cache, prefill, step = self._kv_fns
        cache = init_cache()
        # prefill pads to the fixed window so the scan compiles once; the
        # <=pos mask makes pad rows unreachable by real queries
        toks = jnp.asarray(np.pad(np.asarray(ids, np.int32), (0, W - len(ids))))
        cache, logits = prefill(cache, toks, len(ids))
        out = list(ids)
        out.append(_sample(np.asarray(logits), temperature, rng,
                           top_k=top_k, top_p=top_p,
                           repetition_penalty=repetition_penalty, prev_ids=out))
        if stream is not None:
            stream(out[-1])
        for _ in range(max_new_tokens - 1):
            if eos_id is not None and out[-1] == eos_id:
                break
            pos = jnp.int32(len(out) - 1)
            cache, logits = step(cache, pos, jnp.int32(out[-1]))
            out.append(_sample(np.asarray(logits), temperature, rng,
                               top_k=top_k, top_p=top_p,
                               repetition_penalty=repetition_penalty,
                               prev_ids=out))
            if stream is not None:
                stream(out[-1])
        return out

    def generate_batch(self, prompts, max_new_tokens: int = 20,
                       temperature: float = 0.0,
                       rng: np.random.Generator = None, top_k: int = 0,
                       top_p: float = 0.0, eos_id: int = None):
        """Batched compiled KV decoding: B ragged prompts decode together.

        The single-sequence compiled programs (``_kv_functions``) are lifted
        over the batch with ``jax.vmap`` -- parameters broadcast as closure
        constants, per-sequence caches/positions map over the leading axis --
        so every generated round costs ONE program dispatch for the whole
        batch (serving throughput) instead of B.  Finished rows re-write
        their last cache slot harmlessly until all rows hit ``eos_id``.

        Returns a list of B token lists (prompt + generated, eos included).
        """
        from .decoding import generate_batch

        return generate_batch(self, prompts, max_new_tokens,
                              temperature=temperature, rng=rng, top_k=top_k,
                              top_p=top_p, eos_id=eos_id)

    def quantize_serving(self, enable: bool = True):
        """int8 weight-only decode: store the per-layer matrices + lm head
        of the compiled KV-decode programs as per-output-channel symmetric
        int8.  Decode is HBM-bound on weight reads, so this roughly halves
        per-token traffic vs bf16; training/forward paths are untouched.
        Rebuilds the decode programs on the next generate call."""
        self._serve_quant = bool(enable)
        for attr in ("_kv_fns", "_kv_batch_fns", "_dev_gen",
                     "_dev_gen_batch"):
            if hasattr(self, attr):
                delattr(self, attr)
        return self

    def quantize_kv(self, enable: bool = True):
        """int8 KV cache: store decode-cache rows as per-row symmetric int8
        with f32 scales.  At long windows the KV read is the decode
        bandwidth term (W*L*2*d bytes/token, vs fixed weight bytes); int8
        halves it vs bf16 (4x vs f32) at ~1e-3 relative error per row.
        Composes with quantize_serving() (int8 weights + int8 KV).
        Rebuilds the decode programs on the next generate call."""
        self._kv_quant = bool(enable)
        for attr in ("_kv_fns", "_kv_batch_fns", "_dev_gen",
                     "_dev_gen_batch"):
            if hasattr(self, attr):
                delattr(self, attr)
        return self

    def generate_device(self, ids, max_new_tokens: int = 20,
                        temperature: float = 0.0, top_k: int = 0,
                        top_p: float = 0.0, eos_id: int = None,
                        seed: int = 0):
        """Whole-generation-on-device decode: prefill + every step + the
        sampling run inside ONE compiled program (models/decoding.py:
        generate_device) -- one dispatch/readback per generation instead of
        per token, the latency-optimal serving path."""
        from .decoding import generate_device

        return generate_device(self, list(ids), max_new_tokens,
                               temperature=temperature, top_k=top_k,
                               top_p=top_p, eos_id=eos_id, seed=seed)

    def generate_batch_device(self, prompts, max_new_tokens: int = 20,
                              temperature: float = 0.0, top_k: int = 0,
                              top_p: float = 0.0, eos_id: int = None,
                              seed: int = 0):
        """Batched whole-generation-on-device decode (vmap of
        generate_device): B prompts, one dispatch for everything."""
        from .decoding import generate_batch_device

        return generate_batch_device(self, prompts, max_new_tokens,
                                     temperature=temperature, top_k=top_k,
                                     top_p=top_p, eos_id=eos_id, seed=seed)

    @staticmethod
    def remap_hf_state(state: dict) -> dict:
        """HuggingFace GPT-2 state dict -> our names (Conv1D transposed)."""
        out = {}
        for name, arr in state.items():
            name = name.removeprefix("transformer.")
            if name.endswith(".attn.bias") or name.endswith(".attn.masked_bias"):
                continue  # causal-mask buffers
            if name == "lm_head.weight":
                continue  # tied to wte
            name = name.replace("wte.", "wte.").replace("wpe.", "wpe.")
            name = name.replace(".mlp.c_fc.", ".c_fc.").replace(".mlp.c_proj.", ".c_proj.")
            # HF Conv1D stores (in, out); our Linear stores (out, in)
            if name.endswith(".weight") and any(
                k in name for k in (".c_attn.", ".c_proj.", ".c_fc.")
            ):
                arr = np.ascontiguousarray(arr.T)
            out[name] = arr
        return out

    @staticmethod
    def from_pretrained(name: str = "gpt2"):
        from lightgrad_tpu.utils import fetch, load_torch_state_dict

        url = f"https://huggingface.co/{name}/resolve/main/"
        cfg = GPTConfig(**json.loads(fetch(url + "config.json")))
        model = GPT(cfg)
        state = load_torch_state_dict(fetch(url + "pytorch_model.bin"))
        model.load_parameters(GPT.remap_hf_state(state))
        return model, cfg

    def export_hf_state(self) -> dict:
        """Our parameter tree -> HuggingFace GPT-2 names (inverse of
        :meth:`remap_hf_state`: Conv1D weights transposed back, mlp
        prefixes restored)."""
        out = {}
        for name, arr in self.state_dict().items():
            hf = name
            if ".attn." not in hf:
                hf = hf.replace(".c_fc.", ".mlp.c_fc.")
                hf = hf.replace(".c_proj.", ".mlp.c_proj.")
            if hf.endswith(".weight") and any(
                k in hf for k in (".c_attn.", ".c_proj.", ".c_fc.")
            ):
                arr = np.ascontiguousarray(arr.T)
            out[hf] = arr
        return out

    def save_pretrained(self, directory: str) -> str:
        """Write an HF-loadable checkpoint dir (pytorch_model.bin + config)."""
        import os

        from lightgrad_tpu.utils import save_torch_state_dict

        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, "pytorch_model.bin")
        save_torch_state_dict(self.export_hf_state(), path)
        cfg = {
            "model_type": "gpt2",
            "vocab_size": self.cfg.vocab_size,
            "n_positions": self.cfg.n_positions,
            "n_embd": self.cfg.n_embd,
            "n_layer": self.cfg.n_layer,
            "n_head": self.cfg.n_head,
            "layer_norm_epsilon": self.cfg.layer_norm_epsilon,
        }
        with open(os.path.join(directory, "config.json"), "w") as f:
            json.dump(cfg, f, indent=1)
        return path


class ByteTokenizer:
    """Offline fallback: raw UTF-8 bytes (vocab 256)."""

    vocab_size = 256

    def encode(self, text: str):
        return list(text.encode("utf-8"))

    def decode(self, ids):
        return bytes(int(i) % 256 for i in ids).decode("utf-8", errors="replace")


class GPT2Tokenizer:
    """Byte-level BPE (GPT-2 flavour), built from HF vocab.json + merges.txt."""

    def __init__(self, vocab: dict, merges):
        self.encoder = dict(vocab)
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.bpe_ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.byte_enc = self._bytes_to_unicode()
        self.byte_dec = {v: k for k, v in self.byte_enc.items()}
        self._cache = {}
        # native merge core (native/bpe.cc): symbols are vocab ids, so it
        # applies only when every merge's parts AND result are vocab entries
        # (true for the real GPT-2 vocab); otherwise the Python loop runs
        self._native_handle = -1
        try:
            from lightgrad_tpu import native

            pa, pb, mg = [], [], []
            for a, b in self.bpe_ranks:
                ia, ib = self.encoder.get(a), self.encoder.get(b)
                im = self.encoder.get(a + b)
                if ia is None or ib is None or im is None:
                    pa = None
                    break
                pa.append(ia)
                pb.append(ib)
                mg.append(im)
            if pa:
                self._native_handle = native.bpe_new(
                    np.array(pa), np.array(pb), np.array(mg))
        except Exception:
            self._native_handle = -1

    @staticmethod
    def _bytes_to_unicode():
        bs = (list(range(ord("!"), ord("~") + 1))
              + list(range(ord("\xa1"), ord("\xac") + 1))
              + list(range(ord("\xae"), ord("\xff") + 1)))
        cs = bs[:]
        n = 0
        for b in range(256):
            if b not in bs:
                bs.append(b)
                cs.append(256 + n)
                n += 1
        return dict(zip(bs, (chr(c) for c in cs)))

    def _bpe(self, token: str):
        word = list(token)
        while len(word) > 1:
            pairs = [(word[i], word[i + 1]) for i in range(len(word) - 1)]
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            merged, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and (word[i], word[i + 1]) == best:
                    merged.append(word[i] + word[i + 1])
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = merged
        return word

    def _encode_word(self, mapped: str):
        """BPE one pre-split word -> vocab ids (cached; native core when
        every initial symbol is a vocab entry, Python loop otherwise)."""
        cached = self._cache.get(mapped)
        if cached is not None:
            return cached
        ids = None
        if self._native_handle >= 0:
            word = [self.encoder.get(ch) for ch in mapped]
            if all(w is not None for w in word):
                from lightgrad_tpu import native

                ids = native.bpe_encode(
                    self._native_handle,
                    np.array(word, np.int32)).tolist()
        if ids is None:
            ids = [self.encoder[p] for p in self._bpe(mapped)
                   if p in self.encoder]
        self._cache[mapped] = ids
        return ids

    def _batch_fill_cache(self, words):
        """One native call merges every uncached word of a text (the
        per-call ctypes overhead dominates word-at-a-time for typical <24
        symbol words -- measured 4x slower than Python; batched it wins)."""
        from lightgrad_tpu import native

        todo, seen = [], set()
        for w in words:
            if w in self._cache or w in seen:
                continue
            syms = [self.encoder.get(ch) for ch in w]
            if any(s is None for s in syms):
                continue  # unknown base symbol: Python fallback handles it
            todo.append((w, syms))
            seen.add(w)
        if not todo:
            return
        flat = np.fromiter((s for _, syms in todo for s in syms), np.int32)
        offs = np.zeros(len(todo) + 1, np.int64)
        np.cumsum([len(syms) for _, syms in todo], out=offs[1:])
        out, counts = native.bpe_encode_batch(self._native_handle, flat, offs)
        pos = 0
        for (w, _), c in zip(todo, counts):
            self._cache[w] = out[pos:pos + int(c)].tolist()
            pos += int(c)

    def encode(self, text: str):
        import re

        pat = re.compile(
            r"'s|'t|'re|'ve|'m|'ll|'d| ?\w+| ?[^\s\w]+|\s+(?!\S)|\s+"
        )
        mapped = ["".join(self.byte_enc[b] for b in tok.encode("utf-8"))
                  for tok in pat.findall(text)]
        if self._native_handle >= 0:
            self._batch_fill_cache(mapped)
        ids = []
        for mw in mapped:
            ids.extend(self._encode_word(mw))
        return ids

    def decode(self, ids):
        text = "".join(self.decoder.get(int(i), "") for i in ids)
        return bytes(self.byte_dec.get(c, 32) for c in text).decode("utf-8", errors="replace")

    @staticmethod
    def from_pretrained(name: str = "gpt2"):
        from lightgrad_tpu.utils import fetch

        vocab = json.loads(fetch(f"https://huggingface.co/{name}/resolve/main/vocab.json"))
        merges_txt = fetch(f"https://huggingface.co/{name}/resolve/main/merges.txt").decode("utf-8")
        merges = [tuple(line.split()) for line in merges_txt.splitlines()[1:] if line.strip()]
        return GPT2Tokenizer(vocab, merges)
