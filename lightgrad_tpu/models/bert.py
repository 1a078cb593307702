"""BERT family: config, masked-LM model, WordPiece tokenizer.

Parity target: reference examples/bert.py (the reference keeps the model in
the example script; here it is a first-class model family).  TPU-native
details: native Embedding gather (no CPU round-trip, cf. reference
bert.py:19-21), whole-forward jit compilation, HF checkpoint import through
``lightgrad_tpu.utils.load_torch_state_dict``.
"""

import json

import numpy as np

import lightgrad_tpu.nn as nn
from lightgrad_tpu.autograd import Tensor

__all__ = ["BertConfig", "BertModel", "BertForMaskedLM", "BertTokenizer"]


class BertConfig:
    def __init__(self, vocab_size=30522, hidden_size=768, num_hidden_layers=12,
                 num_attention_heads=12, intermediate_size=3072,
                 max_position_embeddings=512, type_vocab_size=2,
                 layer_norm_eps=1e-12, scan_layers=False, remat=False,
                 **unused):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.max_position_embeddings = max_position_embeddings
        self.type_vocab_size = type_vocab_size
        self.layer_norm_eps = layer_norm_eps
        # lax.scan over stacked layer params (lightgrad_tpu/scan.py):
        # O(1) compile size in depth; remat recomputes block activations
        self.scan_layers = scan_layers
        self.remat = remat


class BertEmbedding(nn.Module):
    def __init__(self, cfg: BertConfig):
        super().__init__()
        self.word_embeddings = nn.Embedding(cfg.vocab_size, cfg.hidden_size)
        self.position_embeddings = nn.Embedding(cfg.max_position_embeddings, cfg.hidden_size)
        self.token_type_embeddings = nn.Embedding(cfg.type_vocab_size, cfg.hidden_size)
        self.LayerNorm = nn.LayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps)

    def forward(self, input_ids, token_type_ids=None):
        b, s = input_ids.shape
        pos = Tensor.from_numpy(np.arange(s, dtype=np.int32), requires_grad=False)
        if token_type_ids is None:
            # segment 0 everywhere (HF semantics: type embeddings always added)
            token_type_ids = Tensor.from_numpy(
                np.zeros((b, s), dtype=np.int32), requires_grad=False
            )
        e = (
            self.word_embeddings(input_ids)
            + self.position_embeddings(pos)
            + self.token_type_embeddings(token_type_ids)
        )
        return self.LayerNorm(e)


class BertSelfAttention(nn.Module):
    def __init__(self, cfg: BertConfig):
        super().__init__()
        self.n_heads = cfg.num_attention_heads
        self.head_dim = cfg.hidden_size // cfg.num_attention_heads
        self.query = nn.Linear(cfg.hidden_size, cfg.hidden_size)
        self.key = nn.Linear(cfg.hidden_size, cfg.hidden_size)
        self.value = nn.Linear(cfg.hidden_size, cfg.hidden_size)

    def _split(self, x, b, s):
        # (b, s, h) -> (b, heads, s, head_dim)
        return x.reshape(b, s, self.n_heads, self.head_dim).transpose(0, 2, 1, 3)

    def forward(self, x, mask=None, output_attentions: bool = False,
                lengths=None):
        """``output_attentions=True`` materializes and returns the softmax
        probabilities alongside the context -- the reference's
        ``BertSelfAttention.forward`` return contract (reference
        examples/bert.py:88), as a debugging escape hatch.  The fused
        flash/ring paths never materialize scores, so requesting them forces
        the materialized path (O(s^2) memory -- debugging only)."""
        b, s, h = x.shape
        q = self._split(self.query(x), b, s)
        k = self._split(self.key(x), b, s)
        v = self._split(self.value(x), b, s)
        scale = 1.0 / np.sqrt(self.head_dim)
        if output_attentions:
            scores = (q @ k.transpose(0, 1, 3, 2)) * scale
            if mask is not None:
                # cast: an f32 mask would upcast the whole residual
                # stream of a bf16 model (same hazard as the causal mask,
                # ops/attention.py)
                scores = scores + (mask.astype(scores.dtype)
                                   if mask.dtype != scores.dtype else mask)
            probs = scores.softmax(axis=-1)
            ctx = probs @ v
            return ctx.transpose(0, 2, 1, 3).reshape(b, s, h), probs
        if lengths is not None and hasattr(q, "attention"):
            # right-padding handled INSIDE the flash kernel: O(s) memory,
            # no materialized additive mask (ops/attention.py lengths path).
            # Padded QUERY rows output zeros (vs the additive-mask path,
            # where they attend valid keys) -- downstream values at padded
            # positions are meaningless either way.
            ctx = q.attention(k, v, scale=scale, lengths=lengths)
            return ctx.transpose(0, 2, 1, 3).reshape(b, s, h)
        sp = getattr(self, "_sequence_parallel", None)
        if mask is None and sp is not None and hasattr(q, "ring_attention"):
            # sequence-parallel ring attention: K/V chunks stay sharded on
            # the sp axis and rotate via ppermute (no full-sequence gather)
            mesh, axis, batch_axis = sp
            ctx = q.ring_attention(k, v, scale=scale, mesh=mesh, axis=axis,
                                   batch_axis=batch_axis)
        elif mask is None and hasattr(q, "attention"):
            # fused flash-attention pallas kernel: scores never hit HBM
            ctx = q.attention(k, v, scale=scale)
        else:
            scores = (q @ k.transpose(0, 1, 3, 2)) * scale
            if mask is not None:
                # cast: an f32 mask would upcast the whole residual
                # stream of a bf16 model (same hazard as the causal mask,
                # ops/attention.py)
                scores = scores + (mask.astype(scores.dtype)
                                   if mask.dtype != scores.dtype else mask)
            ctx = scores.softmax(axis=-1) @ v
        return ctx.transpose(0, 2, 1, 3).reshape(b, s, h)


class BertAttention(nn.Module):
    def __init__(self, cfg: BertConfig):
        super().__init__()
        self.self = BertSelfAttention(cfg)
        self.dense = nn.Linear(cfg.hidden_size, cfg.hidden_size)
        self.LayerNorm = nn.LayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps)

    def forward(self, x, mask=None, lengths=None):
        return self.LayerNorm(
            self.dense(self.self(x, mask, lengths=lengths)) + x)


class BertLayer(nn.Module):
    def __init__(self, cfg: BertConfig):
        super().__init__()
        self.attention = BertAttention(cfg)
        self.intermediate = nn.Linear(cfg.hidden_size, cfg.intermediate_size)
        self.output = nn.Linear(cfg.intermediate_size, cfg.hidden_size)
        self.LayerNorm = nn.LayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps)

    def forward(self, x, mask=None, lengths=None):
        a = self.attention(x, mask, lengths=lengths)
        return self.LayerNorm(self.output(self.intermediate(a).gelu()) + a)


class BertModel(nn.Module):
    def __init__(self, cfg: BertConfig):
        super().__init__()
        self.cfg = cfg
        self.embeddings = BertEmbedding(cfg)
        blocks = [BertLayer(cfg) for _ in range(cfg.num_hidden_layers)]
        if getattr(cfg, "scan_layers", False):
            from lightgrad_tpu.scan import ScannedStack

            self.layer = ScannedStack(blocks, remat=getattr(cfg, "remat", False))
        else:
            self.layer = nn.ModuleList(*blocks)

    def forward(self, input_ids, attention_mask=None, token_type_ids=None,
                attention_lengths=None):
        """``attention_lengths``: right-padded batches as per-example valid
        lengths -- masked inside the flash kernel (O(s) memory) instead of
        the materialized additive ``attention_mask``.  Use one or the
        other."""
        mask = None
        if attention_mask is not None:
            assert attention_lengths is None, "pass mask OR lengths, not both"
            # additive mask: 0 where attended, -1e9 where padded
            mask = (1.0 - attention_mask.reshape(
                attention_mask.shape[0], 1, 1, attention_mask.shape[1]
            )) * -1e9
        x = self.embeddings(input_ids, token_type_ids)
        if isinstance(self.layer, nn.ModuleList):
            for layer in self.layer:
                x = layer(x, mask, lengths=attention_lengths)
        else:
            x = self.layer(x, mask)  # ScannedStack: mask broadcast per layer
        return x


class BertForMaskedLM(nn.Module):
    def __init__(self, cfg: BertConfig):
        super().__init__()
        self.cfg = cfg
        self.bert = BertModel(cfg)
        self.transform = nn.Linear(cfg.hidden_size, cfg.hidden_size)
        self.transform_ln = nn.LayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps)
        self.decoder = nn.Linear(cfg.hidden_size, cfg.vocab_size)

    def forward(self, input_ids, attention_mask=None, token_type_ids=None,
                attention_lengths=None):
        x = self.bert(input_ids, attention_mask, token_type_ids,
                      attention_lengths=attention_lengths)
        x = self.transform_ln(self.transform(x).gelu())
        return self.decoder(x)

    # HF checkpoint name -> our parameter-tree name
    _RENAMES = [
        ("bert.encoder.layer.", "bert.layer."),
        ("cls.predictions.transform.dense.", "transform."),
        ("cls.predictions.transform.LayerNorm.", "transform_ln."),
        ("cls.predictions.decoder.", "decoder."),
    ]

    @staticmethod
    def remap_hf_state(state: dict) -> dict:
        """Translate a HuggingFace BERT state dict to our parameter names."""
        remapped = {}
        for hf_name, arr in state.items():
            name = hf_name
            for src, dst in BertForMaskedLM._RENAMES:
                if name.startswith(src):
                    name = dst + name[len(src):]
                    break
            name = name.replace(".attention.output.dense.", ".attention.dense.")
            name = name.replace(".attention.output.LayerNorm.", ".attention.LayerNorm.")
            name = name.replace(".intermediate.dense.", ".intermediate.")
            name = name.replace(".output.dense.", ".output.")
            name = name.replace(".output.LayerNorm.", ".LayerNorm.")
            remapped[name] = arr
        if "cls.predictions.bias" in state:
            remapped["decoder.bias"] = state["cls.predictions.bias"]
        # drop HF extras we don't model (pooler, NSP head, buffer tensors)
        remapped = {
            k: v for k, v in remapped.items()
            if not k.startswith(("bert.pooler.", "cls."))
            and not k.endswith(".position_ids")
        }
        return remapped

    @staticmethod
    def from_pretrained(name: str = "bert-base-uncased"):
        from lightgrad_tpu.utils import fetch, load_torch_state_dict

        url = f"https://huggingface.co/{name}/resolve/main/"
        cfg = BertConfig(**json.loads(fetch(url + "config.json")))
        model = BertForMaskedLM(cfg)
        state = load_torch_state_dict(fetch(url + "pytorch_model.bin"))
        model.load_parameters(BertForMaskedLM.remap_hf_state(state))
        return model, cfg

    def export_hf_state(self) -> dict:
        """Our parameter tree -> HuggingFace BERT names (inverse of
        :meth:`remap_hf_state`; save-side export the reference lacked)."""
        import re

        out = {}
        for name, arr in self.state_dict().items():
            hf = name
            hf = hf.replace(".attention.dense.", ".attention.output.dense.")
            hf = hf.replace(".attention.LayerNorm.", ".attention.output.LayerNorm.")
            hf = hf.replace(".intermediate.", ".intermediate.dense.")
            hf = re.sub(r"(\.layer\.\d+)\.LayerNorm\.", r"\1.output.LayerNorm.", hf)
            hf = re.sub(r"(\.layer\.\d+)\.output\.(weight|bias)$",
                        r"\1.output.dense.\2", hf)
            for src, dst in self._RENAMES:
                if hf.startswith(dst):
                    hf = src + hf[len(dst):]
                    break
            hf = hf.replace("bert.layer.", "bert.encoder.layer.")
            out[hf] = arr
        if "cls.predictions.decoder.bias" in out:
            out["cls.predictions.bias"] = out["cls.predictions.decoder.bias"]
        return out

    def save_pretrained(self, directory: str) -> str:
        """Write an HF-loadable checkpoint dir (pytorch_model.bin + config)."""
        import os

        from lightgrad_tpu.utils import save_torch_state_dict

        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, "pytorch_model.bin")
        save_torch_state_dict(self.export_hf_state(), path)
        cfg = {
            "model_type": "bert",
            "vocab_size": self.cfg.vocab_size,
            "hidden_size": self.cfg.hidden_size,
            "num_hidden_layers": self.cfg.num_hidden_layers,
            "num_attention_heads": self.cfg.num_attention_heads,
            "intermediate_size": self.cfg.intermediate_size,
            "max_position_embeddings": self.cfg.max_position_embeddings,
            "layer_norm_eps": self.cfg.layer_norm_eps,
        }
        with open(os.path.join(directory, "config.json"), "w") as f:
            json.dump(cfg, f, indent=1)
        return path


# ---------------------------------------------------------------------------
# WordPiece tokenizer (from scratch; parity with reference bert.py:249-329)
# ---------------------------------------------------------------------------
class BertTokenizer:
    SPECIALS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]

    def __init__(self, vocab):
        self.vocab = list(vocab)
        self.ids = {tok: i for i, tok in enumerate(self.vocab)}

    @staticmethod
    def from_pretrained(name: str = "bert-base-uncased"):
        from lightgrad_tpu.utils import fetch

        txt = fetch(f"https://huggingface.co/{name}/resolve/main/vocab.txt")
        return BertTokenizer(txt.decode("utf-8").splitlines())

    @staticmethod
    def synthetic():
        words = [f"tok{i}" for i in range(995)]
        return BertTokenizer(BertTokenizer.SPECIALS + words)

    def _wordpiece(self, word):
        """Greedy longest-match-first sub-word split."""
        pieces, start = [], 0
        while start < len(word):
            end, cur = len(word), None
            while end > start:
                piece = word[start:end]
                if start > 0:
                    piece = "##" + piece
                if piece in self.ids:
                    cur = piece
                    break
                end -= 1
            if cur is None:
                return ["[UNK]"]
            pieces.append(cur)
            start = end
        return pieces

    def tokenize(self, text: str):
        import re

        out = []
        for chunk in re.split(r"(\[mask\])", text.lower()):
            if chunk == "[mask]":
                out.append("[MASK]")
                continue
            for word in re.findall(r"\w+|[^\w\s]", chunk):
                out.extend(self._wordpiece(word))
        return out

    def convert_tokens_to_ids(self, tokens):
        unk = self.ids["[UNK]"]
        return [self.ids.get(t, unk) for t in tokens]

    def convert_ids_to_tokens(self, ids):
        return [self.vocab[i] for i in ids]

    def encode(self, text: str):
        return self.convert_tokens_to_ids(["[CLS]"] + self.tokenize(text) + ["[SEP]"])
