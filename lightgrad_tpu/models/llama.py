"""LLaMA-family decoder: RoPE, RMSNorm, SwiGLU, grouped-query attention.

Third model family (the reference ships one BERT example,
``/root/reference/examples/bert.py``; GPT-2 was round 1's second): the
modern decoder recipe most open checkpoints use (Llama/Mistral/Qwen-style),
with HuggingFace checkpoint import/export and the same two decode paths as
GPT -- fixed-window recompute on any backend, and a compiled fixed-shape
KV-cache step (prefill ``lax.scan`` + one-token step) on jax backends.

TPU-first notes: attention runs through the fused flash kernel (causal);
GQA repeats K/V heads with a gather whose backward is a scatter-add, so the
tape trains grouped-query models too; RoPE tables are baked per (seq, dim)
as device constants inside compiled steps.
"""

import json

import numpy as np

import lightgrad_tpu.nn as nn
from lightgrad_tpu.autograd import Tensor, no_grad

__all__ = ["LlamaConfig", "Llama", "RMSNorm", "LlamaTokenizer"]


class LlamaConfig:
    def __init__(self, vocab_size=32000, hidden_size=512, intermediate_size=1376,
                 num_hidden_layers=4, num_attention_heads=8,
                 num_key_value_heads=None, max_position_embeddings=2048,
                 rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
                 scan_layers=False, remat=False, num_local_experts=0,
                 num_experts_per_tok=2, attention_bias=False, head_dim=None,
                 hidden_act="silu", rms_offset=False,
                 scale_embeddings=False, sliding_window=None,
                 use_sliding_window=True, **unused):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads or num_attention_heads
        self.max_position_embeddings = max_position_embeddings
        self.rms_norm_eps = rms_norm_eps
        self.rope_theta = rope_theta
        self.tie_word_embeddings = tie_word_embeddings
        # lax.scan over stacked layer params (lightgrad_tpu/scan.py)
        self.scan_layers = scan_layers
        self.remat = remat
        # Mixtral-style sparse MoE (HF MixtralConfig field names): every
        # block's SwiGLU MLP becomes num_local_experts routed experts with
        # top-(num_experts_per_tok) dispatch.  No capacity drops (Mixtral
        # semantics): capacity_factor = E/k makes cap = n_tokens.
        self.num_local_experts = num_local_experts
        self.num_experts_per_tok = num_experts_per_tok
        # Qwen2-style attention: q/k/v Linears carry biases (o_proj never
        # does) -- everything else is the LLaMA recipe, so Qwen2 checkpoints
        # load through the same family
        self.attention_bias = attention_bias
        # Gemma variants: explicit head_dim (may differ from hidden/heads),
        # tanh-gelu MLP activation, (1 + w) RMSNorm weights (zero-init
        # deltas), and sqrt(hidden) embedding scaling
        self.head_dim = head_dim or hidden_size // num_attention_heads
        self.hidden_act = hidden_act
        self.rms_offset = rms_offset
        self.scale_embeddings = scale_embeddings
        # Mistral-style sliding-window attention: position i attends to keys
        # in [i-W+1, i], masked inside the flash kernel (band block-skip).
        # Qwen2 checkpoints carry sliding_window but use_sliding_window=False
        # (HF semantics: the field is inert unless enabled).
        self.sliding_window = (int(sliding_window)
                               if sliding_window and use_sliding_window
                               else None)
        if num_local_experts and scan_layers:
            raise ValueError(
                "scan_layers cannot thread per-forward MoE aux state; "
                "use scan_layers=False with num_local_experts")


class RMSNorm(nn.Module):
    """``offset=1.0`` is the Gemma convention: the checkpoint stores
    zero-initialized DELTAS and the effective scale is ``1 + w``."""

    def __init__(self, dim: int, eps: float = 1e-5, offset: float = 0.0):
        super().__init__()
        self.weight = Tensor.ones((dim,))
        self.eps = eps
        self.offset = offset

    def forward(self, x):
        var = (x * x).mean(axis=-1, keepdims=True)
        w = self.weight + self.offset if self.offset else self.weight
        return x * (var + self.eps) ** -0.5 * w


def _rope_tables(seq: int, head_dim: int, theta: float):
    """HF-convention RoPE tables: cos/sin of shape (seq, head_dim), the
    half-frequencies tiled twice along the feature axis."""
    freqs = 1.0 / theta ** (np.arange(0, head_dim, 2, np.float32) / head_dim)
    ang = np.outer(np.arange(seq, dtype=np.float32), freqs)  # (s, hd/2)
    emb = np.concatenate([ang, ang], axis=-1)               # (s, hd)
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def _apply_rope(x, cos_t, sin_t):
    """x: (b, h, s, hd) tape tensor; cos/sin: (1, 1, s, hd) constants."""
    hd = x.shape[-1]
    x1 = x[..., : hd // 2]
    x2 = x[..., hd // 2:]
    rotated = (-x2).concat(x1, axis=-1)
    return x * cos_t + rotated * sin_t


class LlamaAttention(nn.Module):
    def __init__(self, cfg: LlamaConfig):
        super().__init__()
        self.n_heads = cfg.num_attention_heads
        self.n_kv = cfg.num_key_value_heads
        self.head_dim = (getattr(cfg, "head_dim", None)
                         or cfg.hidden_size // cfg.num_attention_heads)
        self.theta = cfg.rope_theta
        h = cfg.hidden_size
        qh, kvh = self.n_heads * self.head_dim, self.n_kv * self.head_dim
        ab = getattr(cfg, "attention_bias", False)
        self.q_proj = nn.Linear(h, qh, bias=ab)
        self.k_proj = nn.Linear(h, kvh, bias=ab)
        self.v_proj = nn.Linear(h, kvh, bias=ab)
        self.o_proj = nn.Linear(qh, h, bias=False)
        self.sliding_window = getattr(cfg, "sliding_window", None)

    def forward(self, x):
        b, s, h = x.shape
        hd = self.head_dim
        q = self.q_proj(x).reshape(b, s, self.n_heads, hd).transpose(0, 2, 1, 3)
        k = self.k_proj(x).reshape(b, s, self.n_kv, hd).transpose(0, 2, 1, 3)
        v = self.v_proj(x).reshape(b, s, self.n_kv, hd).transpose(0, 2, 1, 3)

        cos_np, sin_np = _rope_tables(s, hd, self.theta)
        cos_t = type(x).from_numpy(cos_np[None, None], requires_grad=False)
        sin_t = type(x).from_numpy(sin_np[None, None], requires_grad=False)
        q = _apply_rope(q, cos_t, sin_t)
        k = _apply_rope(k, cos_t, sin_t)

        scale = 1.0 / np.sqrt(hd)
        # sliding window is a no-op when the sequence fits inside it
        win = self.sliding_window
        win = int(win) if win and win < s else 0
        sp = getattr(self, "_sequence_parallel", None)
        fused = hasattr(q, "attention")
        if self.n_kv != self.n_heads and not (fused and sp is None):
            # grouped-query expand (gather fwd, scatter-add bwd) -- only for
            # the ring-attention and raw-score fallbacks; the fused flash
            # path is GQA-aware (ops/attention.py serves n_heads/n_kv query
            # blocks from one K/V head via index maps, no expanded copy)
            rep = self.n_heads // self.n_kv
            idx = np.repeat(np.arange(self.n_kv), rep)
            k = k[:, idx]
            v = v[:, idx]
        if sp is not None and hasattr(q, "ring_attention"):
            # sequence-parallel ring attention; RoPE was applied on the
            # global sequence above, so sharded chunks carry true positions
            # (GQA repeat already expanded K/V to full head count)
            if win:
                raise NotImplementedError(
                    "ring attention + sliding window not supported; run "
                    "sliding-window models without sequence parallelism")
            mesh, axis, batch_axis = sp
            ctx = q.ring_attention(k, v, scale=scale, mesh=mesh, axis=axis,
                                   causal=True, batch_axis=batch_axis)
        elif fused:
            ctx = q.attention(k, v, scale=scale, causal=True, window=win)
        else:
            scores = (q @ k.transpose(0, 1, 3, 2)) * scale
            mask = np.triu(np.full((s, s), -1e30, np.float32), k=1)
            if win:
                mask = mask + np.tril(
                    np.full((s, s), -1e30, np.float32), k=-win)
            scores = scores + type(x).from_numpy(mask, requires_grad=False)
            ctx = scores.softmax(axis=-1) @ v
        return self.o_proj(
            ctx.transpose(0, 2, 1, 3).reshape(b, s, self.n_heads * hd))


class LlamaMLP(nn.Module):
    """SwiGLU: down(silu(gate(x)) * up(x))."""

    def __init__(self, cfg: LlamaConfig):
        super().__init__()
        h, i = cfg.hidden_size, cfg.intermediate_size
        act = getattr(cfg, "hidden_act", "silu")
        self.act = ("gelu_tanh" if act in ("gelu", "gelu_pytorch_tanh")
                    else "silu")
        self.gate_proj = nn.Linear(h, i, bias=False)
        self.up_proj = nn.Linear(h, i, bias=False)
        self.down_proj = nn.Linear(i, h, bias=False)

    def forward(self, x):
        g = self.gate_proj(x)
        act = g.gelu() if self.act == "gelu_tanh" else g.sigmoid() * g
        return self.down_proj(act * self.up_proj(x))


class LlamaLayer(nn.Module):
    def __init__(self, cfg: LlamaConfig):
        super().__init__()
        off = 1.0 if getattr(cfg, "rms_offset", False) else 0.0
        self.input_layernorm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps,
                                       offset=off)
        self.self_attn = LlamaAttention(cfg)
        self.post_attention_layernorm = RMSNorm(
            cfg.hidden_size, cfg.rms_norm_eps, offset=off)
        e = getattr(cfg, "num_local_experts", 0)
        if e:
            # Mixtral block: routed SwiGLU experts, softmax-all + top-k
            # renormalized gates, no capacity drops (cf = E/k -> cap = T)
            self.block_sparse_moe = nn.MoE(
                cfg.hidden_size, cfg.intermediate_size, e,
                dispatch="topk", k=cfg.num_experts_per_tok,
                capacity_factor=e / cfg.num_experts_per_tok,
                normalize_gates=True, ffn="swiglu")
        else:
            self.mlp = LlamaMLP(cfg)

    def forward(self, x):
        x = x + self.self_attn(self.input_layernorm(x))
        ffn = getattr(self, "block_sparse_moe", None) or self.mlp
        return x + ffn(self.post_attention_layernorm(x))


class Llama(nn.Module):
    """Causal LM with a separate (or tied) LM head."""

    def __init__(self, cfg: LlamaConfig):
        super().__init__()
        self.cfg = cfg
        self.embed_tokens = nn.Embedding(cfg.vocab_size, cfg.hidden_size)
        blocks = [LlamaLayer(cfg) for _ in range(cfg.num_hidden_layers)]
        if getattr(cfg, "scan_layers", False):
            from lightgrad_tpu.scan import ScannedStack

            self.layers = ScannedStack(blocks, remat=getattr(cfg, "remat", False))
        else:
            self.layers = nn.ModuleList(*blocks)
        self.norm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps,
                            offset=1.0 if getattr(cfg, "rms_offset", False)
                            else 0.0)
        if not cfg.tie_word_embeddings:
            self.lm_head = nn.Linear(cfg.hidden_size, cfg.vocab_size, bias=False)

    def forward(self, input_ids):
        x = self.embed_tokens(input_ids)
        if getattr(self.cfg, "scale_embeddings", False):
            x = x * float(self.cfg.hidden_size ** 0.5)
        if isinstance(self.layers, nn.ModuleList):
            for layer in self.layers:
                x = layer(x)
        else:
            x = self.layers(x)  # ScannedStack: one lax.scan over the stack
        # router losses (Mixtral blocks): summed per forward, plain attrs
        aux = zl = None
        if isinstance(self.layers, nn.ModuleList):
            for layer in self.layers:
                moe = getattr(layer, "block_sparse_moe", None)
                a = getattr(moe, "aux_loss", None)
                if a is not None:
                    aux = a if aux is None else aux + a
                z = getattr(moe, "z_loss", None)
                if z is not None:
                    zl = z if zl is None else zl + z
        object.__setattr__(self, "aux_loss", aux)
        object.__setattr__(self, "z_loss", zl)
        x = self.norm(x)
        if self.cfg.tie_word_embeddings:
            return x @ self.embed_tokens.weight.T(1, 0)
        return self.lm_head(x)

    # --- generation (mirrors GPT: recompute path + compiled KV cache) ------
    @no_grad()
    def generate(self, ids, max_new_tokens: int = 20, temperature: float = 0.0,
                 rng: np.random.Generator = None, use_cache: bool = True,
                 top_k: int = 0, top_p: float = 0.0, num_beams: int = 1,
                 eos_id: int = None, length_penalty: float = 1.0):
        from .gpt import _NotJaxBacked, _sample

        ids = list(ids)
        rng = rng or np.random.default_rng(0)
        window = self.cfg.max_position_embeddings
        if num_beams > 1:
            from .decoding import beam_search

            assert temperature == 0.0, "beam search is deterministic"
            return beam_search(self, ids, max_new_tokens, beam_size=num_beams,
                               eos_id=eos_id, length_penalty=length_penalty)
        if use_cache:
            try:
                return self._generate_kv(ids, max_new_tokens, temperature, rng,
                                         top_k=top_k, top_p=top_p)
            except _NotJaxBacked:
                pass
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
            ids.append(_sample(logits, temperature, rng, top_k=top_k, top_p=top_p))
        return ids

    def _kv_functions(self):
        import jax
        import jax.numpy as jnp

        from lightgrad_tpu.ops.attention import attention_fwd as kattn_fwd
        from lightgrad_tpu.ops.decode_attention import (
            decode_attention as kdecode_attn)

        from .gpt import _NotJaxBacked

        cfg = self.cfg
        H, KV = cfg.num_attention_heads, cfg.num_key_value_heads
        hd = getattr(cfg, "head_dim", None) or cfg.hidden_size // H
        L, W = cfg.num_hidden_layers, cfg.max_position_embeddings
        eps = cfg.rms_norm_eps
        off = 1.0 if getattr(cfg, "rms_offset", False) else 0.0
        gelu_act = getattr(cfg, "hidden_act", "silu") in (
            "gelu", "gelu_pytorch_tanh")
        emb_scale = (float(cfg.hidden_size ** 0.5)
                     if getattr(cfg, "scale_embeddings", False) else None)
        p = {}
        for name, t in self.named_parameters():
            buf = t.data
            if not isinstance(buf, jnp.ndarray):
                raise _NotJaxBacked(type(buf).__name__)
            p[name] = buf
        if not isinstance(self.layers, nn.ModuleList):
            # scanned stack: expose per-layer views under layers.{l}. names
            for l in range(L):
                for n, arr in self.layers.layer_params(l).items():
                    p[f"layers.{l}.{n}"] = arr
        # python float (weak-typed): np.float64 scalars would promote every
        # bf16 score to f32 and poison the residual stream
        scale = float(1.0 / np.sqrt(hd))
        cdt = p["embed_tokens.weight"].dtype  # compute dtype (f32 or bf16)
        cos_np, sin_np = _rope_tables(W, hd, cfg.rope_theta)
        cos_w, sin_w = jnp.asarray(cos_np, cdt), jnp.asarray(sin_np, cdt)
        rep = H // KV
        n_exp = getattr(cfg, "num_local_experts", 0)
        topk = getattr(cfg, "num_experts_per_tok", 2)
        att_bias = getattr(cfg, "attention_bias", False)

        if getattr(self, "_serve_quant", False):
            # int8 weight-only serving (quantize_serving(), see gpt.py):
            # per-output-channel symmetric int8 for every 2-D projection
            # except the embedding (gather path) and the MoE router (its
            # argmax-ish decisions are quantization-sensitive); the tied or
            # untied head gets its own int8 copy.
            big = [n for n in list(p)
                   if n.endswith(".weight") and p[n].ndim == 2
                   and n != "embed_tokens.weight" and "router" not in n]
            for n in big:
                w = np.asarray(p.pop(n), np.float32)
                ws = np.maximum(np.abs(w).max(axis=1), 1e-8) / 127.0
                p[n + "#q"] = jnp.asarray(
                    np.clip(np.round(w / ws[:, None]), -127, 127), jnp.int8)
                p[n + "#s"] = jnp.asarray(ws, cdt)
            if cfg.tie_word_embeddings:
                w = np.asarray(p["embed_tokens.weight"], np.float32)
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
            if cfg.tie_word_embeddings:
                if "head#q" in p:
                    return (x @ p["head#q"].T.astype(cdt)) * p["head#s"]
                return x @ p["embed_tokens.weight"].T
            return mm(x, p, "lm_head.weight")

        # int8 KV cache (quantize_kv(), see gpt.py): per-row symmetric int8
        # rows + f32 scales; dequant fuses into the score/context dots
        kv_quant = bool(getattr(self, "_kv_quant", False))

        def _q_rows(kv):
            s = jnp.maximum(
                jnp.max(jnp.abs(kv.astype(jnp.float32)), -1, keepdims=True),
                1e-8) / 127.0
            q8 = jnp.clip(jnp.round(kv.astype(jnp.float32) / s),
                          -127, 127).astype(jnp.int8)
            return q8, s

        def rms(x, w):
            var = jnp.mean(x * x, axis=-1, keepdims=True)
            return x * jax.lax.rsqrt(var + eps) * (w + off if off else w)

        def act(g):
            if gelu_act:
                return 0.5 * g * (1 + jnp.tanh(
                    0.7978845608028654 * (g + 0.044715 * g ** 3)))
            return jax.nn.silu(g)

        def rope1(x, pos):
            # x: (heads, 1, hd) at a single position
            c, s_ = cos_w[pos][None, None, :], sin_w[pos][None, None, :]
            x1, x2 = x[..., : hd // 2], x[..., hd // 2:]
            return x * c + jnp.concatenate([-x2, x1], axis=-1) * s_

        swin = getattr(cfg, "sliding_window", None)

        def step(p, cache, pos, tok):
            # p is a runtime argument, not a closure (decoding.ParamFn):
            # closure weights embed as HLO constants and blow the tunnel's
            # remote-compile size limit for real checkpoints
            x = p["embed_tokens.weight"][tok][None, :]           # (1, d)
            if emb_scale is not None:
                x = x * jnp.asarray(emb_scale, x.dtype)
            for l in range(L):
                pre = f"layers.{l}."
                h = rms(x, p[pre + "input_layernorm.weight"])
                q = mm(h, p, pre + "self_attn.q_proj.weight")
                k = mm(h, p, pre + "self_attn.k_proj.weight")
                v = mm(h, p, pre + "self_attn.v_proj.weight")
                if att_bias:
                    q = q + p[pre + "self_attn.q_proj.bias"]
                    k = k + p[pre + "self_attn.k_proj.bias"]
                    v = v + p[pre + "self_attn.v_proj.bias"]
                q = q.reshape(H, 1, hd)
                k = k.reshape(KV, 1, hd)
                v = v.reshape(KV, 1, hd)
                q, k = rope1(q, pos), rope1(k, pos)
                # ONE dynamic_update_slice straight into the stacked cache:
                # the read-slice/update/write-back idiom made XLA materialize
                # full (KV, W, hd) slice copies per layer -- measured 0.10 ms
                # per decoded token on GPT-2-small (benchmarks/decode_budget)
                if kv_quant:
                    cq, cs = cache
                    kvq, kvs = _q_rows(jnp.stack([k, v]))  # (2, KV, 1, hd)
                    cq = jax.lax.dynamic_update_slice(
                        cq, kvq[None], (l, 0, 0, pos, 0))
                    cs = jax.lax.dynamic_update_slice(
                        cs, kvs[None], (l, 0, 0, pos, 0))
                    kq3, ks3 = cq[l, 0], cs[l, 0]   # (KV,W,hd), (KV,W,1)
                    vq3, vs3 = cq[l, 1], cs[l, 1]
                    q3 = q.reshape(KV, rep, hd).astype(jnp.float32)
                    s3 = jnp.einsum("kgd,ksd->kgs", q3,
                                    kq3.astype(jnp.float32)) * scale
                    s3 = s3 * ks3[:, :, 0][:, None, :]
                    colr = jnp.arange(W, dtype=jnp.int32)
                    ok = (colr <= pos)[None, None, :]
                    if swin:
                        ok = jnp.logical_and(
                            ok, (colr > pos - swin)[None, None, :])
                    s3 = jnp.where(ok, s3, -1e30)
                    pr = jax.nn.softmax(s3, axis=-1) \
                        * vs3[:, :, 0][:, None, :]
                    att = jnp.einsum("kgs,ksd->kgd", pr,
                                     vq3.astype(jnp.float32))
                    att = att.astype(cdt).reshape(1, H * hd)
                    cache = (cq, cs)
                else:
                    kv_new = jnp.stack([k, v])[None]    # (1, 2, KV, 1, hd)
                    cache = jax.lax.dynamic_update_slice(
                        cache, kv_new, (l, 0, 0, pos, 0))
                    kc, vc = cache[l, 0], cache[l, 1]
                    # fused grouped-query decode attention: scores + mask +
                    # softmax + context in ONE kernel, the rep query heads
                    # of each KV head served without a repeated K/V copy
                    # (ops/decode_attention.py)
                    att = kdecode_attn(q.reshape(KV, rep, hd), kc, vc, pos,
                                       scale, window=swin or 0)
                    att = att.reshape(1, H * hd)
                x = x + mm(att, p, pre + "self_attn.o_proj.weight")
                h2 = rms(x, p[pre + "post_attention_layernorm.weight"])
                if n_exp:
                    # Mixtral routed FFN for ONE token: softmax over all
                    # experts, top-k gather of the expert stacks, renormalized
                    # gate mix (same math as nn.MoE's topk path)
                    rl = (h2 @ p[pre + "block_sparse_moe.router.weight"].T)[0]
                    pr = jax.nn.softmax(rl.astype(jnp.float32))
                    gates, idx = jax.lax.top_k(pr, topk)         # (k,)
                    gates = (gates / gates.sum()).astype(h2.dtype)
                    w1 = p[pre + "block_sparse_moe.w1"][idx]     # (k, d, ff)
                    w3 = p[pre + "block_sparse_moe.w3"][idx]
                    w2 = p[pre + "block_sparse_moe.w2"][idx]     # (k, ff, d)
                    g = jnp.einsum("td,kdf->ktf", h2, w1)
                    u = jnp.einsum("td,kdf->ktf", h2, w3)
                    y = jnp.einsum("ktf,kfd->ktd", act(g) * u, w2)
                    x = x + jnp.einsum("k,ktd->td", gates, y)
                else:
                    g = mm(h2, p, pre + "mlp.gate_proj.weight")
                    u = mm(h2, p, pre + "mlp.up_proj.weight")
                    x = x + mm(act(g) * u,
                               p, pre + "mlp.down_proj.weight")
            x = rms(x, p["norm.weight"])
            return cache, head_mm(x, p)[0]

        def init_cache():
            if kv_quant:
                return (jnp.zeros((L, 2, KV, W, hd), jnp.int8),
                        jnp.zeros((L, 2, KV, W, 1), jnp.float32))
            return jnp.zeros((L, 2, KV, W, hd), dtype=p["embed_tokens.weight"].dtype)

        def prefill_scan(p, cache, toks, n_real):
            """One-token-at-a-time prefill: kept for the routed-MoE variant,
            whose per-token top-k expert gather does not vectorize over
            positions without materializing (W, k, d, ff) expert stacks."""
            def body(c, inp):
                pos, tok = inp
                c, logits = step(p, c, pos, tok)
                return c, logits

            n = toks.shape[0]
            cache, all_logits = jax.lax.scan(
                body, cache, (jnp.arange(n, dtype=jnp.int32), toks))
            return cache, all_logits[n_real - 1]

        def rope_all(x):
            # x: (heads, W, hd); position i rotated by cos/sin row i
            c, s_ = cos_w[None, :, :], sin_w[None, :, :]
            x1, x2 = x[..., : hd // 2], x[..., hd // 2:]
            return x * c + jnp.concatenate([-x2, x1], axis=-1) * s_

        def prefill_bulk(p, cache, toks, n_real):
            """Bulk prefill: the prompt forward runs PARALLEL over positions
            (one (W, d) pass under the causal/sliding-window mask) and
            writes every K/V row at once -- see gpt.py prefill for why this
            replaces the W-sequential-steps scan."""
            x = p["embed_tokens.weight"][toks]                   # (W, d)
            if emb_scale is not None:
                x = x * jnp.asarray(emb_scale, x.dtype)
            for l in range(L):
                pre = f"layers.{l}."
                h = rms(x, p[pre + "input_layernorm.weight"])
                q = mm(h, p, pre + "self_attn.q_proj.weight")
                k = mm(h, p, pre + "self_attn.k_proj.weight")
                v = mm(h, p, pre + "self_attn.v_proj.weight")
                if att_bias:
                    q = q + p[pre + "self_attn.q_proj.bias"]
                    k = k + p[pre + "self_attn.k_proj.bias"]
                    v = v + p[pre + "self_attn.v_proj.bias"]
                q = rope_all(q.reshape(W, H, hd).transpose(1, 0, 2))
                k = rope_all(k.reshape(W, KV, hd).transpose(1, 0, 2))
                v = v.reshape(W, KV, hd).transpose(1, 0, 2)
                if kv_quant:
                    # quantize-on-write; the prefill pass itself attends the
                    # full-precision K/V it just computed (see gpt.py)
                    cq, cs = cache
                    kvq, kvs = _q_rows(jnp.stack([k, v]))
                    cache = (cq.at[l].set(kvq), cs.at[l].set(kvs))
                else:
                    cache = cache.at[l, 0].set(k).at[l, 1].set(v)
                # flash-attention prefill (GQA served via the kernel's
                # index maps: q heads are kv-major, head h reads KV head
                # h // rep -- no repeated K/V, no H x W^2 score tensor in
                # HBM; causal + sliding-window banding inside the kernel)
                att = kattn_fwd(q, k, v, scale, causal=True,
                                window=swin or 0)                # (H, W, hd)
                att = att.transpose(1, 0, 2).reshape(W, H * hd)
                x = x + mm(att, p, pre + "self_attn.o_proj.weight")
                h2 = rms(x, p[pre + "post_attention_layernorm.weight"])
                g = mm(h2, p, pre + "mlp.gate_proj.weight")
                u = mm(h2, p, pre + "mlp.up_proj.weight")
                x = x + mm(act(g) * u, p, pre + "mlp.down_proj.weight")
            x = rms(x, p["norm.weight"])
            return cache, head_mm(x[n_real - 1][None], p)[0]

        prefill = prefill_scan if n_exp else prefill_bulk

        from .decoding import ParamFn

        return init_cache, ParamFn(prefill, p), ParamFn(step, p)

    def generate_batch(self, prompts, max_new_tokens: int = 20,
                       temperature: float = 0.0,
                       rng: np.random.Generator = None, top_k: int = 0,
                       top_p: float = 0.0, eos_id: int = None):
        """Batched compiled KV decoding (see models/decoding.py:
        generate_batch -- the vmap lift over the _kv_functions contract)."""
        from .decoding import generate_batch

        return generate_batch(self, prompts, max_new_tokens,
                              temperature=temperature, rng=rng, top_k=top_k,
                              top_p=top_p, eos_id=eos_id)

    def quantize_serving(self, enable: bool = True):
        """int8 weight-only decode (see gpt.py): per-output-channel int8
        projections in the compiled KV programs; embedding gather and the
        MoE router stay full-precision.  Rebuilds on next generate."""
        self._serve_quant = bool(enable)
        for attr in ("_kv_fns", "_kv_batch_fns", "_dev_gen",
                     "_dev_gen_batch"):
            if hasattr(self, attr):
                delattr(self, attr)
        return self

    def quantize_kv(self, enable: bool = True):
        """int8 KV cache (see gpt.py quantize_kv): per-row symmetric int8
        cache rows + f32 scales, GQA-aware dequant-in-dot.  Composes with
        quantize_serving().  Rebuilds on next generate."""
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
        """Whole-generation-on-device decode (models/decoding.py:
        generate_device): one dispatch/readback per generation."""
        from .decoding import generate_device

        return generate_device(self, list(ids), max_new_tokens,
                               temperature=temperature, top_k=top_k,
                               top_p=top_p, eos_id=eos_id, seed=seed)

    def generate_batch_device(self, prompts, max_new_tokens: int = 20,
                              temperature: float = 0.0, top_k: int = 0,
                              top_p: float = 0.0, eos_id: int = None,
                              seed: int = 0):
        """Batched whole-generation-on-device decode."""
        from .decoding import generate_batch_device

        return generate_batch_device(self, prompts, max_new_tokens,
                                     temperature=temperature, top_k=top_k,
                                     top_p=top_p, eos_id=eos_id, seed=seed)

    def _generate_kv(self, ids, max_new_tokens, temperature, rng,
                     top_k: int = 0, top_p: float = 0.0):
        import jax.numpy as jnp

        from .gpt import _sample

        W = self.cfg.max_position_embeddings
        assert len(ids) + max_new_tokens <= W, (
            f"KV-cache decode needs prompt+new <= max_position_embeddings "
            f"({len(ids)}+{max_new_tokens} > {W}); use use_cache=False")
        if not hasattr(self, "_kv_fns"):
            self._kv_fns = self._kv_functions()
        init_cache, prefill, step = self._kv_fns
        cache = init_cache()
        toks = jnp.asarray(np.pad(np.asarray(ids, np.int32), (0, W - len(ids))))
        cache, logits = prefill(cache, toks, len(ids))
        out = list(ids)
        out.append(_sample(np.asarray(logits), temperature, rng,
                           top_k=top_k, top_p=top_p))
        for _ in range(max_new_tokens - 1):
            pos = jnp.int32(len(out) - 1)
            cache, logits = step(cache, pos, jnp.int32(out[-1]))
            out.append(_sample(np.asarray(logits), temperature, rng,
                           top_k=top_k, top_p=top_p))
        return out

    # --- HF interop ---------------------------------------------------------
    @staticmethod
    def remap_hf_state(state: dict) -> dict:
        import re

        out = {}
        experts = {}  # (layer, which) -> {expert_idx: array}
        for name, arr in state.items():
            name = name.removeprefix("model.")
            if name.endswith(".rotary_emb.inv_freq"):
                continue  # recomputed
            m = re.match(
                r"(layers\.\d+\.block_sparse_moe)\.experts\.(\d+)"
                r"\.(w[123])\.weight$", name)
            if m:
                # HF Mixtral stores per-expert (out, in) Linears; our nn.MoE
                # holds one stacked (E, in, out) tensor per projection
                experts.setdefault((m.group(1), m.group(3)), {})[
                    int(m.group(2))] = np.ascontiguousarray(arr.T)
                continue
            name = name.replace(".block_sparse_moe.gate.weight",
                                ".block_sparse_moe.router.weight")
            out[name] = arr
        for (prefix, which), by_idx in experts.items():
            stack = np.stack([by_idx[i] for i in range(len(by_idx))])
            out[f"{prefix}.{which}"] = stack
        return out

    def export_hf_state(self) -> dict:
        out = {}
        for name, arr in self.state_dict().items():
            hf = name if name.startswith("lm_head.") else "model." + name
            out[hf] = arr
        return out

    @staticmethod
    def from_pretrained(name: str):
        from lightgrad_tpu.utils import fetch, load_torch_state_dict

        url = f"https://huggingface.co/{name}/resolve/main/"
        cfg = LlamaConfig(**json.loads(fetch(url + "config.json")))
        model = Llama(cfg)
        state = load_torch_state_dict(fetch(url + "pytorch_model.bin"))
        model.load_parameters(Llama.remap_hf_state(state))
        return model, cfg

    def save_pretrained(self, directory: str) -> str:
        import os

        from lightgrad_tpu.utils import save_torch_state_dict

        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, "pytorch_model.bin")
        save_torch_state_dict(self.export_hf_state(), path)
        cfg = {
            "model_type": "llama",
            "vocab_size": self.cfg.vocab_size,
            "hidden_size": self.cfg.hidden_size,
            "intermediate_size": self.cfg.intermediate_size,
            "num_hidden_layers": self.cfg.num_hidden_layers,
            "num_attention_heads": self.cfg.num_attention_heads,
            "num_key_value_heads": self.cfg.num_key_value_heads,
            "max_position_embeddings": self.cfg.max_position_embeddings,
            "rms_norm_eps": self.cfg.rms_norm_eps,
            "rope_theta": self.cfg.rope_theta,
            "tie_word_embeddings": self.cfg.tie_word_embeddings,
        }
        if getattr(self.cfg, "sliding_window", None):
            cfg["model_type"] = "mistral"
            cfg["sliding_window"] = self.cfg.sliding_window
        with open(os.path.join(directory, "config.json"), "w") as f:
            json.dump(cfg, f, indent=1)
        return path


# ---------------------------------------------------------------------------
# tokenizer: SentencePiece model import (pure-python reader; byte fallback)
# ---------------------------------------------------------------------------
class LlamaTokenizer:
    """LLaMA tokenizer over a SentencePiece ``tokenizer.model``.

    Loads the protobuf via :mod:`lightgrad_tpu.utils.sentencepiece` (no
    ``sentencepiece`` install needed).  ``encode`` adds the BOS id like the
    HF tokenizer; control pieces are dropped on decode."""

    def __init__(self, sp, bos_id: int = 1, eos_id: int = 2):
        self.sp = sp
        self.bos_id, self.eos_id = bos_id, eos_id

    @property
    def vocab_size(self):
        return len(self.sp)

    @classmethod
    def from_file(cls, path: str):
        from lightgrad_tpu.utils.sentencepiece import SentencePieceModel

        return cls(SentencePieceModel.from_file(path))

    @classmethod
    def from_pretrained(cls, name: str):
        from lightgrad_tpu.utils import fetch
        from lightgrad_tpu.utils.sentencepiece import SentencePieceModel

        url = f"https://huggingface.co/{name}/resolve/main/tokenizer.model"
        return cls(SentencePieceModel.from_bytes(fetch(url)))

    def encode(self, text: str, bos: bool = True):
        ids = self.sp.encode(text)
        return [self.bos_id] + ids if bos else ids

    def decode(self, ids):
        return self.sp.decode([i for i in ids
                               if i not in (self.bos_id, self.eos_id)])
