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


class GPTConfig:
    def __init__(self, vocab_size=50257, n_positions=1024, n_embd=768,
                 n_layer=12, n_head=12, layer_norm_epsilon=1e-5, **unused):
        self.vocab_size = vocab_size
        self.n_positions = n_positions
        self.n_embd = n_embd
        self.n_layer = n_layer
        self.n_head = n_head
        self.layer_norm_epsilon = layer_norm_epsilon


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
        if hasattr(q, "attention"):
            y = q.attention(k, v, scale=scale, causal=True)
        else:
            scores = (q @ k.transpose(0, 1, 3, 2)) * scale
            mask = np.triu(np.full((s, s), -1e30, np.float32), k=1)
            scores = scores + type(x).from_numpy(mask, requires_grad=False)
            y = scores.softmax(axis=-1) @ v
        y = y.transpose(0, 2, 1, 3).reshape(b, s, h)
        return self.c_proj(y)


class GPTBlock(nn.Module):
    def __init__(self, cfg: GPTConfig):
        super().__init__()
        self.ln_1 = nn.LayerNorm(cfg.n_embd, eps=cfg.layer_norm_epsilon)
        self.attn = CausalSelfAttention(cfg)
        self.ln_2 = nn.LayerNorm(cfg.n_embd, eps=cfg.layer_norm_epsilon)
        self.c_fc = nn.Linear(cfg.n_embd, 4 * cfg.n_embd)
        self.c_proj = nn.Linear(4 * cfg.n_embd, cfg.n_embd)

    def forward(self, x):
        x = x + self.attn(self.ln_1(x))
        return x + self.c_proj(self.c_fc(self.ln_2(x)).gelu())


class GPT(nn.Module):
    """GPT-2 causal language model (pre-LN, weight-tied LM head)."""

    def __init__(self, cfg: GPTConfig):
        super().__init__()
        self.cfg = cfg
        self.wte = nn.Embedding(cfg.vocab_size, cfg.n_embd)
        self.wpe = nn.Embedding(cfg.n_positions, cfg.n_embd)
        self.h = nn.ModuleList(*[GPTBlock(cfg) for _ in range(cfg.n_layer)])
        self.ln_f = nn.LayerNorm(cfg.n_embd, eps=cfg.layer_norm_epsilon)

    def forward(self, input_ids):
        b, s = input_ids.shape
        pos = Tensor.from_numpy(np.arange(s, dtype=np.int32), requires_grad=False)
        x = self.wte(input_ids) + self.wpe(pos)
        for block in self.h:
            x = block(x)
        x = self.ln_f(x)
        # weight-tied LM head: logits = x @ wte^T
        return x @ self.wte.weight.T(1, 0)

    @no_grad()
    def generate(self, ids, max_new_tokens: int = 20, temperature: float = 0.0,
                 rng: np.random.Generator = None):
        """Autoregressive decode (full recompute; greedy when temperature=0).

        The context is right-padded to the fixed ``n_positions`` window --
        under a causal mask the logits at the last *real* position are
        unaffected by right padding, so every decode step reuses ONE compiled
        shape instead of recompiling per context length.
        """
        ids = list(ids)
        rng = rng or np.random.default_rng(0)
        window = self.cfg.n_positions
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
            if temperature <= 0:
                nxt = int(np.argmax(logits))
            else:
                p = np.exp((logits - logits.max()) / temperature)
                p /= p.sum()
                nxt = int(rng.choice(len(p), p=p))
            ids.append(nxt)
        return ids

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

    def encode(self, text: str):
        import re

        pat = re.compile(
            r"'s|'t|'re|'ve|'m|'ll|'d| ?\w+| ?[^\s\w]+|\s+(?!\S)|\s+"
        )
        ids = []
        for tok in pat.findall(text):
            mapped = "".join(self.byte_enc[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[p] for p in self._bpe(mapped) if p in self.encoder)
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
