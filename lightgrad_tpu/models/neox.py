"""GPT-NeoX / Pythia family: parallel-residual decoder with partial RoPE.

A distinct architecture class from both GPT-2 (learned positions, serial
residual) and LLaMA (RMSNorm, SwiGLU): biased LayerNorms, a fused
per-head-packed QKV projection, rotary embeddings on only the first
``rotary_pct`` of each head's dims, exact (erf) GELU MLPs, and the
parallel residual ``x + attn(ln1(x)) + mlp(ln2(x))`` (Pythia/NeoX-20B
default; ``use_parallel_residual=False`` gives the serial variant).
No reference counterpart (the reference ships one BERT example).

HF checkpoint interop: parameter names mirror ``GPTNeoXForCausalLM``
minus the ``gpt_neox.`` prefix; logit parity is tested against
transformers at both rotary_pct settings and both residual layouts
(tests/test_neox.py).
"""

import json

import numpy as np

import lightgrad_tpu.nn as nn
from lightgrad_tpu.autograd import Tensor, no_grad
from .llama import _rope_tables

__all__ = ["NeoXConfig", "NeoX"]


class NeoXConfig:
    def __init__(self, vocab_size=50304, hidden_size=512,
                 intermediate_size=2048, num_hidden_layers=6,
                 num_attention_heads=8, max_position_embeddings=2048,
                 rotary_pct=0.25, rotary_emb_base=10000.0,
                 layer_norm_eps=1e-5, use_parallel_residual=True, **unused):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.max_position_embeddings = max_position_embeddings
        self.rotary_pct = rotary_pct
        self.rotary_emb_base = rotary_emb_base
        self.layer_norm_eps = layer_norm_eps
        self.use_parallel_residual = use_parallel_residual


def _apply_partial_rope(x, cos_t, sin_t, rot: int):
    """RoPE on the first ``rot`` dims of (b, h, s, hd); the rest pass
    through (NeoX convention)."""
    xr = x[..., :rot]
    x1, x2 = xr[..., : rot // 2], xr[..., rot // 2:]
    rotated = (-x2).concat(x1, axis=-1)
    xr = xr * cos_t + rotated * sin_t
    if rot == x.shape[-1]:
        return xr
    return xr.concat(x[..., rot:], axis=-1)


class NeoXAttention(nn.Module):
    def __init__(self, cfg: NeoXConfig):
        super().__init__()
        self.n_heads = cfg.num_attention_heads
        self.head_dim = cfg.hidden_size // cfg.num_attention_heads
        self.rot = int(self.head_dim * cfg.rotary_pct)
        self.theta = cfg.rotary_emb_base
        h = cfg.hidden_size
        # fused QKV, PER-HEAD packed: rows are [q_h0, k_h0, v_h0, q_h1, ...]
        # (HF GPTNeoXAttention reshapes to (..., heads, 3*hd) then splits)
        self.query_key_value = nn.Linear(h, 3 * h)
        self.dense = nn.Linear(h, h)

    def forward(self, x):
        b, s, h = x.shape
        hd, H = self.head_dim, self.n_heads
        qkv = self.query_key_value(x).reshape(b, s, H, 3 * hd)
        qkv = qkv.transpose(0, 2, 1, 3)              # (b, H, s, 3hd)
        q = qkv[..., :hd]
        k = qkv[..., hd:2 * hd]
        v = qkv[..., 2 * hd:]

        cos_np, sin_np = _rope_tables(s, self.rot, self.theta)
        cos_t = type(x).from_numpy(cos_np[None, None], requires_grad=False)
        sin_t = type(x).from_numpy(sin_np[None, None], requires_grad=False)
        q = _apply_partial_rope(q, cos_t, sin_t, self.rot)
        k = _apply_partial_rope(k, cos_t, sin_t, self.rot)

        scale = 1.0 / np.sqrt(hd)
        if hasattr(q, "attention"):
            ctx = q.attention(k, v, scale=scale, causal=True)
        else:
            scores = (q @ k.transpose(0, 1, 3, 2)) * scale
            mask = np.triu(np.full((s, s), -1e30, np.float32), k=1)
            scores = scores + type(x).from_numpy(mask, requires_grad=False)
            ctx = scores.softmax(axis=-1) @ v
        return self.dense(ctx.transpose(0, 2, 1, 3).reshape(b, s, h))


class NeoXMLP(nn.Module):
    def __init__(self, cfg: NeoXConfig):
        super().__init__()
        self.dense_h_to_4h = nn.Linear(cfg.hidden_size, cfg.intermediate_size)
        self.dense_4h_to_h = nn.Linear(cfg.intermediate_size, cfg.hidden_size)

    def forward(self, x):
        # exact erf GELU (HF "gelu"): Pythia was trained with it, and the
        # tanh approximation drifts logits visibly over many layers
        return self.dense_4h_to_h(self.dense_h_to_4h(x).gelu_exact())


class NeoXLayer(nn.Module):
    def __init__(self, cfg: NeoXConfig):
        super().__init__()
        self.input_layernorm = nn.LayerNorm(cfg.hidden_size,
                                            eps=cfg.layer_norm_eps)
        self.post_attention_layernorm = nn.LayerNorm(cfg.hidden_size,
                                                     eps=cfg.layer_norm_eps)
        self.attention = NeoXAttention(cfg)
        self.mlp = NeoXMLP(cfg)
        self.parallel = cfg.use_parallel_residual

    def forward(self, x):
        if self.parallel:
            # one residual add for BOTH branches; the MLP reads the
            # POST-attention norm of the ORIGINAL x (NeoX-20B trick: the
            # two norms let the branches run concurrently)
            return (x + self.attention(self.input_layernorm(x))
                    + self.mlp(self.post_attention_layernorm(x)))
        x = x + self.attention(self.input_layernorm(x))
        return x + self.mlp(self.post_attention_layernorm(x))


class NeoX(nn.Module):
    """GPT-NeoX causal LM (untied LM head, like Pythia)."""

    def __init__(self, cfg: NeoXConfig):
        super().__init__()
        self.cfg = cfg
        self.embed_in = nn.Embedding(cfg.vocab_size, cfg.hidden_size)
        self.layers = nn.ModuleList(
            *[NeoXLayer(cfg) for _ in range(cfg.num_hidden_layers)])
        self.final_layer_norm = nn.LayerNorm(cfg.hidden_size,
                                             eps=cfg.layer_norm_eps)
        self.embed_out = nn.Linear(cfg.hidden_size, cfg.vocab_size,
                                   bias=False)

    def forward(self, input_ids):
        x = self.embed_in(input_ids)
        for layer in self.layers:
            x = layer(x)
        return self.embed_out(self.final_layer_norm(x))

    @no_grad()
    def generate(self, ids, max_new_tokens: int = 20,
                 temperature: float = 0.0, rng: np.random.Generator = None):
        """Fixed-window compiled recompute decoding (the KV-cache step
        program for partial-rotary attention is future work; GPT/LLaMA
        document the pattern)."""
        from .gpt import _sample
        from lightgrad_tpu.jit import jit as _step_jit

        ids = [int(t) for t in ids]
        rng = rng or np.random.default_rng(0)
        W = self.cfg.max_position_embeddings
        if not hasattr(self, "_decode_fn"):
            def _decode(x):
                with no_grad():
                    return self.forward(x)

            self._decode_fn = _step_jit(_decode)
        for _ in range(max_new_tokens):
            ctx = ids[-W:]
            padded = ctx + [0] * (W - len(ctx))
            x = Tensor.from_numpy(np.array([padded], np.int32),
                                  requires_grad=False)
            logits = self._decode_fn(x).numpy()[0, len(ctx) - 1]
            ids.append(_sample(logits, temperature, rng))
        return ids

    # ---- HF checkpoint interop ------------------------------------------
    @staticmethod
    def remap_hf_state(state: dict) -> dict:
        out = {}
        for name, arr in state.items():
            name = name.removeprefix("gpt_neox.")
            if ("rotary_emb" in name or name.endswith(".attention.bias")
                    or name.endswith(".masked_bias")):
                continue  # recomputed / causal-mask buffers
            out[name] = arr
        return out

    def export_hf_state(self) -> dict:
        out = {}
        for name, arr in self.state_dict().items():
            hf = name if name.startswith("embed_out.") else "gpt_neox." + name
            out[hf] = arr
        return out

    @staticmethod
    def from_pretrained(name: str = "EleutherAI/pythia-70m"):
        from lightgrad_tpu.utils import fetch, load_torch_state_dict

        url = f"https://huggingface.co/{name}/resolve/main/"
        cfg = NeoXConfig(**json.loads(fetch(url + "config.json")))
        model = NeoX(cfg)
        state = load_torch_state_dict(fetch(url + "pytorch_model.bin"))
        model.load_parameters(NeoX.remap_hf_state(state))
        return model, cfg
