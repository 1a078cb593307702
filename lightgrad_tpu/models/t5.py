"""T5 family: encoder-decoder transformer (relative position biases, RMS
layer norm, cross-attention) with HF checkpoint import/export.

Framework extension -- the reference (ndoll1998/lightgrad) ships no
encoder-decoder model; BERT (reference examples/bert.py) covers encoders
only.  This follows the original T5 formulation as implemented by
HuggingFace ``T5ForConditionalGeneration``:

* ``T5LayerNorm`` is an RMS norm (no mean subtraction, no bias).
* Attention scores are NOT scaled by 1/sqrt(d_kv) -- T5 folds the scale
  into the initialization.
* Only the FIRST self-attention layer of each stack owns a learned
  relative-position-bucket bias table; later layers reuse layer 0's bias.
* Cross-attention carries no position bias.
* With tied embeddings (T5 default) the decoder output is rescaled by
  d_model**-0.5 before the shared-matrix LM head.

The module tree uses HuggingFace's exact parameter names
(``encoder.block.0.layer.0.SelfAttention.q.weight`` ...), so checkpoint
import/export is a near-identity remap.

Relative-position biases are additive score terms, so attention here uses
the materialized-score path (like BERT's masked path, models/bert.py) --
the fused flash kernel has no bias input yet.

Divergence (documented): HF also applies dropout to the post-softmax
attention probabilities; this implementation applies the embedding,
residual, FFN-inner and final dropouts only, keeping the score path
fusable.  Inference and gradcheck parity are unaffected (eval mode).
"""

import json

import numpy as np

from lightgrad_tpu import nn
from lightgrad_tpu.autograd import Tensor

__all__ = ["T5Config", "T5ForConditionalGeneration"]

_NEG = -1e9  # additive mask value (HF uses dtype-min; -1e9 is fusion-safe)


class T5Config:
    def __init__(self, vocab_size=32128, d_model=512, d_kv=64, d_ff=2048,
                 num_layers=6, num_decoder_layers=None, num_heads=8,
                 relative_attention_num_buckets=32,
                 relative_attention_max_distance=128,
                 dropout_rate=0.1, layer_norm_epsilon=1e-6,
                 feed_forward_proj="relu", pad_token_id=0,
                 decoder_start_token_id=0, eos_token_id=1,
                 tie_word_embeddings=True, **unused):
        self.vocab_size = vocab_size
        self.d_model = d_model
        self.d_kv = d_kv
        self.d_ff = d_ff
        self.num_layers = num_layers
        self.num_decoder_layers = (num_decoder_layers if num_decoder_layers
                                   is not None else num_layers)
        self.num_heads = num_heads
        self.relative_attention_num_buckets = relative_attention_num_buckets
        self.relative_attention_max_distance = relative_attention_max_distance
        self.dropout_rate = dropout_rate
        self.layer_norm_epsilon = layer_norm_epsilon
        # "relu" (T5 v1.0: wi -> relu -> wo) or "gated-gelu" (v1.1 / flan:
        # wi_0 gate * wi_1, gelu on the gate)
        self.feed_forward_proj = feed_forward_proj
        self.pad_token_id = pad_token_id
        self.decoder_start_token_id = decoder_start_token_id
        self.eos_token_id = eos_token_id
        self.tie_word_embeddings = tie_word_embeddings

    @property
    def is_gated_act(self):
        return "gated" in self.feed_forward_proj


class T5LayerNorm(nn.Module):
    """RMS norm: no mean subtraction, no bias (HF T5LayerNorm)."""

    def __init__(self, dim: int, eps: float = 1e-6):
        super().__init__()
        self.weight = Tensor.ones((dim,))
        self.eps = eps

    def forward(self, x):
        var = (x * x).mean(axis=-1, keepdims=True)
        return x * (var + self.eps) ** -0.5 * self.weight


def _relative_position_bucket(rel, bidirectional, num_buckets, max_distance):
    """HF T5Attention._relative_position_bucket on a numpy grid (static --
    the bucket matrix depends only on (qlen, klen), never on data)."""
    rel = rel.astype(np.int64)
    buckets = np.zeros_like(rel)
    n = num_buckets
    if bidirectional:
        n //= 2
        buckets += (rel > 0).astype(np.int64) * n
        rel = np.abs(rel)
    else:
        rel = -np.minimum(rel, 0)
    max_exact = n // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1).astype(np.float64) / max_exact)
        / np.log(max_distance / max_exact) * (n - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, n - 1)
    buckets += np.where(is_small, rel, large)
    return buckets.astype(np.int32)


class T5Attention(nn.Module):
    def __init__(self, cfg: T5Config, has_relative_bias: bool, causal: bool):
        super().__init__()
        self.n_heads = cfg.num_heads
        self.d_kv = cfg.d_kv
        self.causal = causal
        self.num_buckets = cfg.relative_attention_num_buckets
        self.max_distance = cfg.relative_attention_max_distance
        inner = cfg.num_heads * cfg.d_kv
        self.q = nn.Linear(cfg.d_model, inner, bias=False)
        self.k = nn.Linear(cfg.d_model, inner, bias=False)
        self.v = nn.Linear(cfg.d_model, inner, bias=False)
        self.o = nn.Linear(inner, cfg.d_model, bias=False)
        if has_relative_bias:
            self.relative_attention_bias = nn.Embedding(
                cfg.relative_attention_num_buckets, cfg.num_heads)

    def compute_bias(self, qlen: int, klen: int):
        """(1, heads, qlen, klen) learned relative-position bias."""
        rel = np.arange(klen)[None, :] - np.arange(qlen)[:, None]  # mem - qry
        buckets = _relative_position_bucket(
            rel, bidirectional=not self.causal,
            num_buckets=self.num_buckets, max_distance=self.max_distance)
        ids = Tensor.from_numpy(buckets, requires_grad=False)
        emb = self.relative_attention_bias(ids)          # (q, k, heads)
        return emb.transpose(2, 0, 1).reshape(1, self.n_heads, qlen, klen)

    def _split(self, x, b, s):
        return x.reshape(b, s, self.n_heads, self.d_kv).transpose(0, 2, 1, 3)

    def step_bias(self, klen: int):
        """(1, heads, 1, klen) bias for the NEWEST query position (KV-cached
        decode: query index = klen-1, keys 0..klen-1)."""
        rel = np.arange(klen)[None, :] - (klen - 1)
        buckets = _relative_position_bucket(
            rel, bidirectional=not self.causal,
            num_buckets=self.num_buckets, max_distance=self.max_distance)
        ids = Tensor.from_numpy(buckets, requires_grad=False)  # (1, klen)
        emb = self.relative_attention_bias(ids)                # (1, klen, h)
        return emb.transpose(2, 0, 1).reshape(1, self.n_heads, 1, klen)

    def decode_self(self, x, past, position_bias):
        """One-token causal self-attention against the (k, v) cache.

        ``x`` is (b, 1, d); ``past`` is None or (k, v) each
        (b, heads, t, d_kv).  No causal mask needed: the cache holds only
        past-and-current positions.  Returns (out, (k, v)) with the new
        token appended."""
        b = x.shape[0]
        q = self._split(self.q(x), b, 1)
        k_new = self._split(self.k(x), b, 1)
        v_new = self._split(self.v(x), b, 1)
        k = k_new if past is None else past[0].concat(k_new, axis=2)
        v = v_new if past is None else past[1].concat(v_new, axis=2)
        scores = q @ k.transpose(0, 1, 3, 2)         # (b, h, 1, t+1)
        if position_bias is not None:
            scores = scores + (position_bias.astype(scores.dtype)
                               if position_bias.dtype != scores.dtype
                               else position_bias)
        ctx = scores.softmax(axis=-1) @ v
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, 1, self.n_heads * self.d_kv)
        return self.o(ctx), (k, v)

    def cross_kv(self, enc):
        """Precompute the encoder-side (k, v) once per generation."""
        b, sk, _ = enc.shape
        return self._split(self.k(enc), b, sk), self._split(self.v(enc), b, sk)

    def decode_cross(self, x, kv, mask=None):
        """One-token cross-attention against precomputed encoder (k, v)."""
        b = x.shape[0]
        q = self._split(self.q(x), b, 1)
        k, v = kv
        scores = q @ k.transpose(0, 1, 3, 2)
        if mask is not None:
            scores = scores + (mask.astype(scores.dtype)
                               if mask.dtype != scores.dtype else mask)
        ctx = scores.softmax(axis=-1) @ v
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, 1, self.n_heads * self.d_kv)
        return self.o(ctx)

    def forward(self, x, kv=None, position_bias=None, mask=None):
        """Returns (context, position_bias) -- the bias is computed by the
        stack's first layer and threaded through the rest (HF contract)."""
        b, sq, _ = x.shape
        kv = x if kv is None else kv
        sk = kv.shape[1]
        q = self._split(self.q(x), b, sq)
        k = self._split(self.k(kv), b, sk)
        v = self._split(self.v(kv), b, sk)
        # NO 1/sqrt(d) scale (T5 folds it into init)
        scores = q @ k.transpose(0, 1, 3, 2)             # (b, h, sq, sk)
        if position_bias is None and hasattr(self, "relative_attention_bias"):
            position_bias = self.compute_bias(sq, sk)
        if position_bias is not None:
            scores = scores + (position_bias.astype(scores.dtype)
                               if position_bias.dtype != scores.dtype
                               else position_bias)
        if self.causal:
            # decoder prefix longer than query (generation): align the
            # triangle to the LAST sq rows of the (sk, sk) causal pattern
            cm = np.triu(np.full((sq, sk), _NEG, np.float32), k=1 + sk - sq)
            cmt = type(x).from_numpy(cm, requires_grad=False)
            scores = scores + (cmt.astype(scores.dtype)
                               if cmt.dtype != scores.dtype else cmt)
        if mask is not None:
            scores = scores + (mask.astype(scores.dtype)
                               if mask.dtype != scores.dtype else mask)
        ctx = scores.softmax(axis=-1) @ v                # (b, h, sq, d_kv)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, sq, self.n_heads * self.d_kv)
        return self.o(ctx), position_bias


class T5LayerSelfAttention(nn.Module):
    def __init__(self, cfg, has_relative_bias, causal):
        super().__init__()
        self.SelfAttention = T5Attention(cfg, has_relative_bias, causal)
        self.layer_norm = T5LayerNorm(cfg.d_model, eps=cfg.layer_norm_epsilon)
        self.dropout = nn.Dropout(cfg.dropout_rate)

    def forward(self, x, position_bias=None, mask=None):
        att, pb = self.SelfAttention(self.layer_norm(x),
                                     position_bias=position_bias, mask=mask)
        return x + self.dropout(att), pb


class T5LayerCrossAttention(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.EncDecAttention = T5Attention(cfg, has_relative_bias=False,
                                           causal=False)
        self.layer_norm = T5LayerNorm(cfg.d_model, eps=cfg.layer_norm_epsilon)
        self.dropout = nn.Dropout(cfg.dropout_rate)

    def forward(self, x, enc, mask=None):
        att, _ = self.EncDecAttention(self.layer_norm(x), kv=enc, mask=mask)
        return x + self.dropout(att)


class T5DenseFF(nn.Module):
    """wi -> relu -> wo (v1.0) or gelu(wi_0) * wi_1 -> wo (gated v1.1)."""

    def __init__(self, cfg):
        super().__init__()
        self.gated = cfg.is_gated_act
        if self.gated:
            self.wi_0 = nn.Linear(cfg.d_model, cfg.d_ff, bias=False)
            self.wi_1 = nn.Linear(cfg.d_model, cfg.d_ff, bias=False)
        else:
            self.wi = nn.Linear(cfg.d_model, cfg.d_ff, bias=False)
        self.wo = nn.Linear(cfg.d_ff, cfg.d_model, bias=False)
        self.dropout = nn.Dropout(cfg.dropout_rate)

    def forward(self, x):
        h = (self.wi_0(x).gelu() * self.wi_1(x)) if self.gated \
            else self.wi(x).relu()
        return self.wo(self.dropout(h))


class T5LayerFF(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.DenseReluDense = T5DenseFF(cfg)
        self.layer_norm = T5LayerNorm(cfg.d_model, eps=cfg.layer_norm_epsilon)
        self.dropout = nn.Dropout(cfg.dropout_rate)

    def forward(self, x):
        return x + self.dropout(self.DenseReluDense(self.layer_norm(x)))


class T5Block(nn.Module):
    def __init__(self, cfg, is_decoder: bool, has_relative_bias: bool):
        super().__init__()
        layers = [T5LayerSelfAttention(cfg, has_relative_bias,
                                       causal=is_decoder)]
        if is_decoder:
            layers.append(T5LayerCrossAttention(cfg))
        layers.append(T5LayerFF(cfg))
        self.layer = nn.ModuleList(*layers)
        self.is_decoder = is_decoder

    def forward(self, x, position_bias=None, mask=None, enc=None,
                enc_mask=None):
        x, pb = self.layer[0](x, position_bias=position_bias, mask=mask)
        if self.is_decoder:
            x = self.layer[1](x, enc, mask=enc_mask)
        return self.layer[-1](x), pb

    def decode(self, x, past, cross_kv, position_bias, enc_mask=None):
        """One-token decoder step against this block's KV caches."""
        sa = self.layer[0]
        att, present = sa.SelfAttention.decode_self(
            sa.layer_norm(x), past, position_bias)
        x = x + sa.dropout(att)
        ca = self.layer[1]
        x = x + ca.dropout(ca.EncDecAttention.decode_cross(
            ca.layer_norm(x), cross_kv, mask=enc_mask))
        return self.layer[-1](x), present


class T5Stack(nn.Module):
    def __init__(self, cfg, shared, is_decoder: bool):
        super().__init__()
        n = cfg.num_decoder_layers if is_decoder else cfg.num_layers
        self.block = nn.ModuleList(*[
            T5Block(cfg, is_decoder, has_relative_bias=(i == 0))
            for i in range(n)])
        self.final_layer_norm = T5LayerNorm(cfg.d_model,
                                            eps=cfg.layer_norm_epsilon)
        self.dropout = nn.Dropout(cfg.dropout_rate)
        self.is_decoder = is_decoder
        # shared embedding table: referenced, NOT registered (it lives as
        # the parent's ``shared`` parameter; registering it here would
        # duplicate it in state_dict/named_parameters)
        object.__setattr__(self, "embed_tokens", shared)

    def forward(self, ids, mask=None, enc=None, enc_mask=None):
        x = self.dropout(self.embed_tokens(ids))
        pb = None
        for block in self.block:
            x, pb = block(x, position_bias=pb, mask=mask, enc=enc,
                          enc_mask=enc_mask)
        return self.dropout(self.final_layer_norm(x))


class T5ForConditionalGeneration(nn.Module):
    """T5 text-to-text model: encoder + causal decoder + LM head."""

    def __init__(self, cfg: T5Config):
        super().__init__()
        self.cfg = cfg
        self.shared = nn.Embedding(cfg.vocab_size, cfg.d_model)
        self.encoder = T5Stack(cfg, self.shared, is_decoder=False)
        self.decoder = T5Stack(cfg, self.shared, is_decoder=True)
        if not cfg.tie_word_embeddings:
            self.lm_head = nn.Linear(cfg.d_model, cfg.vocab_size, bias=False)

    @staticmethod
    def _pad_mask(attention_mask):
        """0/1 (b, sk) mask -> additive (b, 1, 1, sk) score term."""
        b, sk = attention_mask.shape
        return (attention_mask.astype("float32") * -_NEG + _NEG) \
            .reshape(b, 1, 1, sk)

    def encode(self, input_ids, attention_mask=None):
        mask = (self._pad_mask(attention_mask)
                if attention_mask is not None else None)
        return self.encoder(input_ids, mask=mask)

    def forward(self, input_ids, decoder_input_ids, attention_mask=None,
                encoder_outputs=None):
        enc_mask = (self._pad_mask(attention_mask)
                    if attention_mask is not None else None)
        enc = (encoder_outputs if encoder_outputs is not None
               else self.encoder(input_ids, mask=enc_mask))
        dec = self.decoder(decoder_input_ids, enc=enc, enc_mask=enc_mask)
        # tied head: HF rescales decoder output by d_model**-0.5 first
        return self._lm_logits(dec)

    def shift_right(self, labels: np.ndarray) -> np.ndarray:
        """Teacher-forcing decoder inputs: labels shifted right, start token
        prepended, -100 ignore positions replaced by pad."""
        out = np.full_like(labels, self.cfg.decoder_start_token_id)
        out[:, 1:] = labels[:, :-1]
        return np.where(out == -100, self.cfg.pad_token_id, out)

    def _lm_logits(self, dec):
        if self.cfg.tie_word_embeddings:
            dec = dec * (self.cfg.d_model ** -0.5)
            return dec @ self.shared.weight.T(1, 0)
        return self.lm_head(dec)

    def _decode_step(self, tok, pasts, cross_kvs, enc_mask):
        """One cached decoder step: (b, 1) token ids -> ((b, vocab) logits,
        updated self-attention caches)."""
        x = self.decoder.dropout(self.decoder.embed_tokens(tok))
        klen = 1 if pasts[0] is None else pasts[0][0].shape[2] + 1
        pb = self.decoder.block[0].layer[0].SelfAttention.step_bias(klen)
        presents = []
        for block, past, cross in zip(self.decoder.block, pasts, cross_kvs):
            x, present = block.decode(x, past, cross, pb, enc_mask=enc_mask)
            presents.append(present)
        x = self.decoder.dropout(self.decoder.final_layer_norm(x))
        return self._lm_logits(x), presents

    def beam_generate(self, input_ids, max_new_tokens: int = 20,
                      beam_size: int = 4, attention_mask=None,
                      length_penalty: float = 1.0):
        """Length-normalized beam search for ONE source sequence (batch 1),
        over the incremental KV decode.  Caches are immutable tape tensors,
        so a beam copy is a reference copy (same trick as
        models/decoding.py).  ``beam_size=1`` is exactly greedy."""
        from lightgrad_tpu import no_grad

        T = type(input_ids) if not isinstance(input_ids, np.ndarray) else None
        ids_np = input_ids.numpy() if T is not None else input_ids
        assert ids_np.shape[0] == 1, "beam_generate decodes one sequence"
        tensor_cls = T or Tensor
        x_ids = (input_ids if T is not None else
                 tensor_cls.from_numpy(ids_np.astype(np.int32),
                                       requires_grad=False))

        def lsm(x):
            x = np.asarray(x, np.float64)
            m = x.max()
            e = np.exp(x - m)
            return x - m - np.log(e.sum())

        def norm(score, n):
            return score / max(1, n) ** length_penalty

        with no_grad():
            enc = self.encode(x_ids, attention_mask=attention_mask)
            enc_mask = (self._pad_mask(attention_mask)
                        if attention_mask is not None else None)
            cross_kvs = [blk.layer[1].EncDecAttention.cross_kv(enc)
                         for blk in self.decoder.block]
            # beam: (generated tokens, cumulative logprob, pasts)
            beams = [([], 0.0, [None] * len(self.decoder.block))]
            done = []
            for _ in range(max_new_tokens):
                cands = []
                for toks, score, pasts in beams:
                    prev = toks[-1] if toks else self.cfg.decoder_start_token_id
                    tok = tensor_cls.from_numpy(
                        np.array([[prev]], np.int32), requires_grad=False)
                    logits, new_pasts = self._decode_step(
                        tok, pasts, cross_kvs, enc_mask)
                    lp = lsm(logits.numpy()[0, -1])
                    for t in np.argsort(lp)[::-1][:beam_size]:
                        cands.append((toks + [int(t)], score + float(lp[t]),
                                      new_pasts))
                cands.sort(key=lambda c: norm(c[1], len(c[0])), reverse=True)
                beams = []
                for toks, score, pasts in cands:
                    if toks[-1] == self.cfg.eos_token_id:
                        done.append((toks, score))
                    else:
                        beams.append((toks, score, pasts))
                    if len(beams) == beam_size:
                        break
                if not beams:
                    break
            done.extend((toks, score) for toks, score, _ in beams)
            best = max(done, key=lambda d: norm(d[1], len(d[0])))
        return np.array(best[0], np.int32)

    def generate(self, input_ids, max_new_tokens: int = 20,
                 attention_mask=None, temperature: float = 0.0,
                 rng: np.random.Generator = None, use_cache: bool = True):
        """Greedy (or temperature-sampled) decoding.  The encoder runs once.

        ``use_cache=True`` (default) decodes incrementally: per-block
        self-attention K/V caches grow by one position per step and the
        cross-attention K/V are projected from the encoder output once --
        O(n) attention work per new token.  ``use_cache=False`` re-runs the
        decoder over the grown prefix each step (the oracle path; the
        equivalence of the two is tested)."""
        from lightgrad_tpu import no_grad

        T = type(input_ids) if not isinstance(input_ids, np.ndarray) else None
        ids_np = input_ids.numpy() if T is not None else input_ids
        tensor_cls = T or Tensor
        x_ids = (input_ids if T is not None else
                 tensor_cls.from_numpy(ids_np.astype(np.int32),
                                       requires_grad=False))
        b = ids_np.shape[0]

        def pick(last):
            if temperature > 0.0:
                r = rng or np.random.default_rng()
                p = np.exp((last - last.max(-1, keepdims=True)) / temperature)
                p /= p.sum(-1, keepdims=True)
                return np.array([r.choice(len(q), p=q) for q in p])
            return last.argmax(-1)

        with no_grad():
            enc = self.encode(x_ids, attention_mask=attention_mask)
            enc_mask = (self._pad_mask(attention_mask)
                        if attention_mask is not None else None)
            out = np.full((b, 1), self.cfg.decoder_start_token_id, np.int32)
            finished = np.zeros((b,), bool)

            if use_cache:
                cross_kvs = [blk.layer[1].EncDecAttention.cross_kv(enc)
                             for blk in self.decoder.block]
                pasts = [None] * len(self.decoder.block)
                for _ in range(max_new_tokens):
                    tok = tensor_cls.from_numpy(out[:, -1:],
                                                requires_grad=False)
                    logits, pasts = self._decode_step(tok, pasts, cross_kvs,
                                                      enc_mask)
                    nxt = pick(logits.numpy()[:, -1])
                    nxt = np.where(finished, self.cfg.pad_token_id, nxt)
                    out = np.concatenate(
                        [out, nxt[:, None].astype(np.int32)], 1)
                    finished |= nxt == self.cfg.eos_token_id
                    if finished.all():
                        break
                return out[:, 1:]

            for _ in range(max_new_tokens):
                dec_in = tensor_cls.from_numpy(out, requires_grad=False)
                logits = self.forward(None, dec_in,
                                      attention_mask=attention_mask,
                                      encoder_outputs=enc)
                nxt = pick(logits.numpy()[:, -1])
                nxt = np.where(finished, self.cfg.pad_token_id, nxt)
                out = np.concatenate([out, nxt[:, None].astype(np.int32)], 1)
                finished |= nxt == self.cfg.eos_token_id
                if finished.all():
                    break
        return out[:, 1:]

    # ---- compiled KV-cache decoding (jax path) ---------------------------
    def _kv_functions(self, max_len: int):
        """Build ``(encode_fn, cross_fn, step_fn)`` taking the parameter
        dict as a runtime argument -- the T5 analogue of GPT's
        ``_kv_functions`` contract
        (models/gpt.py): the decoder self-attention cache is one stacked
        ``(L, 2, H, max_len, dk)`` array, each step writes the new K/V row at
        ``pos`` via dynamic_update_slice and attends one query over the fixed
        window under a ``<= pos`` mask, so XLA compiles exactly ONE decoder
        program regardless of output length.  ``encode_fn`` compiles once per
        distinct source length (bucket sources for serving)."""
        import jax
        import jax.numpy as jnp

        from .gpt import _NotJaxBacked

        cfg = self.cfg
        H, dk, D = cfg.num_heads, cfg.d_kv, cfg.d_model
        Le, Ld = cfg.num_layers, cfg.num_decoder_layers
        eps = cfg.layer_norm_epsilon
        gated = cfg.is_gated_act
        p = {}
        for name, t in self.named_parameters():
            buf = t.data
            if not isinstance(buf, jnp.ndarray):
                raise _NotJaxBacked(type(buf).__name__)
            p[name] = buf

        def rms(x, w):
            var = (x * x).mean(-1, keepdims=True)
            return x * jax.lax.rsqrt(var + eps) * w

        def gelu(x):
            return 0.5 * x * (1 + jnp.tanh(
                0.7978845608028654 * (x + 0.044715 * x ** 3)))

        def ff(p, x, pre):
            if gated:
                h = gelu(x @ p[pre + "wi_0.weight"].T) \
                    * (x @ p[pre + "wi_1.weight"].T)
            else:
                h = jax.nn.relu(x @ p[pre + "wi.weight"].T)
            return h @ p[pre + "wo.weight"].T

        def heads(x, w):                      # (S, D) @ -> (H, S, dk)
            return (x @ w.T).reshape(-1, H, dk).transpose(1, 0, 2)

        def enc_bias(p, S):
            rel = np.arange(S)[None, :] - np.arange(S)[:, None]
            buckets = _relative_position_bucket(
                rel, bidirectional=True,
                num_buckets=cfg.relative_attention_num_buckets,
                max_distance=cfg.relative_attention_max_distance)
            table = p["encoder.block.0.layer.0.SelfAttention."
                      "relative_attention_bias.weight"]
            return table[jnp.asarray(buckets)].transpose(2, 0, 1)  # (H,S,S)

        # decoder bucket matrix for the fixed window, precomputed host-side
        rel_d = np.arange(max_len)[None, :] - np.arange(max_len)[:, None]
        dec_buckets = jnp.asarray(_relative_position_bucket(
            rel_d, bidirectional=False,
            num_buckets=cfg.relative_attention_num_buckets,
            max_distance=cfg.relative_attention_max_distance))

        def encode_fn(p, toks, add_mask):
            """(S,) int32 + (S,) additive mask -> (S, D) encoder states."""
            x = p["shared.weight"][toks]
            S = toks.shape[0]
            bias = enc_bias(p, S) + add_mask[None, None, :]
            for l in range(Le):
                pre = f"encoder.block.{l}.layer."
                h = rms(x, p[pre + "0.layer_norm.weight"])
                a = pre + "0.SelfAttention."
                q, k, v = (heads(h, p[a + n + ".weight"]) for n in "qkv")
                scores = jnp.einsum("hqd,hkd->hqk", q, k) + bias
                att = jax.nn.softmax(scores, axis=-1) @ v   # (H, S, dk)
                att = att.transpose(1, 0, 2).reshape(S, H * dk)
                x = x + att @ p[a + "o.weight"].T
                h = rms(x, p[pre + "1.layer_norm.weight"])
                x = x + ff(p, h, pre + "1.DenseReluDense.")
            return rms(x, p["encoder.final_layer_norm.weight"])

        def cross_fn(p, enc):
            """Encoder states -> per-decoder-layer cross K/V
            (Ld, 2, H, S, dk)."""
            kv = []
            for l in range(Ld):
                a = f"decoder.block.{l}.layer.1.EncDecAttention."
                kv.append(jnp.stack([heads(enc, p[a + "k.weight"]),
                                     heads(enc, p[a + "v.weight"])]))
            return jnp.stack(kv)

        def step(p, cache, pos, tok, cross, enc_add_mask):
            """One decoder token at ``pos``: returns (cache, logits)."""
            x = p["shared.weight"][tok][None, :]             # (1, D)
            pos_mask = (jnp.arange(max_len) <= pos)[None, None, :]
            brow = jax.lax.dynamic_slice(
                dec_buckets, (pos, 0), (1, max_len))[0]      # (max_len,)
            dtable = p["decoder.block.0.layer.0.SelfAttention."
                       "relative_attention_bias.weight"]
            bias = dtable[brow].T[:, None, :]                # (H, 1, max_len)
            for l in range(Ld):
                pre = f"decoder.block.{l}.layer."
                a = pre + "0.SelfAttention."
                h = rms(x, p[pre + "0.layer_norm.weight"])
                q, k, v = (heads(h, p[a + n + ".weight"]) for n in "qkv")
                # one DUS into the stacked cache (no slice copies -- see
                # benchmarks/decode_budget.py no_kv_write ablation)
                cache = jax.lax.dynamic_update_slice(
                    cache, jnp.stack([k, v])[None], (l, 0, 0, pos, 0))
                kc, vc = cache[l, 0], cache[l, 1]
                scores = jnp.einsum("hqd,hkd->hqk", q, kc) + bias
                scores = jnp.where(pos_mask, scores, -1e9)
                att = jax.nn.softmax(scores, axis=-1) @ vc
                x = x + att.transpose(1, 0, 2).reshape(1, H * dk) \
                    @ p[a + "o.weight"].T
                c = pre + "1.EncDecAttention."
                h = rms(x, p[pre + "1.layer_norm.weight"])
                q = heads(h, p[c + "q.weight"])
                scores = jnp.einsum("hqd,hkd->hqk", q, cross[l, 0]) \
                    + enc_add_mask[None, None, :]
                att = jax.nn.softmax(scores, axis=-1) @ cross[l, 1]
                x = x + att.transpose(1, 0, 2).reshape(1, H * dk) \
                    @ p[c + "o.weight"].T
                h = rms(x, p[pre + "2.layer_norm.weight"])
                x = x + ff(p, h, pre + "2.DenseReluDense.")
            x = rms(x, p["decoder.final_layer_norm.weight"])
            if cfg.tie_word_embeddings:
                return cache, ((x * D ** -0.5) @ p["shared.weight"].T)[0]
            return cache, (x @ p["lm_head.weight"].T)[0]

        # params enter as runtime args (decoding.ParamFn): closure weights
        # embed as HLO constants and exceed the tunnel's compile size limit
        from .decoding import ParamFn

        return ParamFn(encode_fn, p), ParamFn(cross_fn, p), ParamFn(step, p)

    def generate_compiled(self, src_ids, max_new_tokens: int = 20,
                          attention_mask=None, temperature: float = 0.0,
                          rng: np.random.Generator = None):
        """Fixed-shape compiled decoding for ONE source sequence: the
        encoder + cross-K/V run once, then every generated token reuses the
        SAME compiled one-token program (no per-length recompiles, no
        per-op dispatch -- the production serving path; the eager
        ``generate`` is the oracle it is tested against)."""
        import jax.numpy as jnp

        from .gpt import _sample

        src = np.asarray(src_ids if isinstance(src_ids, np.ndarray)
                         else src_ids.numpy(), np.int32)
        assert src.ndim == 1 or src.shape[0] == 1, "one sequence at a time"
        src = src.reshape(-1)
        am = (np.asarray(attention_mask).reshape(-1).astype(np.float32)
              if attention_mask is not None else np.ones(len(src), np.float32))
        add_mask = jnp.asarray((1.0 - am) * _NEG)

        W = max_new_tokens + 1
        key = ("_t5_kv_fns", W)
        if getattr(self, "_t5_kv_cache_key", None) != key:
            object.__setattr__(self, "_t5_kv_fns", self._kv_functions(W))
            object.__setattr__(self, "_t5_kv_cache_key", key)
        encode_fn, cross_fn, step = self._t5_kv_fns

        enc = encode_fn(jnp.asarray(src), add_mask)
        cross = cross_fn(enc)
        H, dk = self.cfg.num_heads, self.cfg.d_kv
        cache = jnp.zeros((self.cfg.num_decoder_layers, 2, H, W, dk),
                          dtype=enc.dtype)
        rng = rng or np.random.default_rng(0)
        out, tok = [], self.cfg.decoder_start_token_id
        for pos in range(max_new_tokens):
            cache, logits = step(cache, jnp.int32(pos), jnp.int32(tok),
                                 cross, add_mask)
            tok = _sample(np.asarray(logits), temperature, rng)
            out.append(int(tok))
            if tok == self.cfg.eos_token_id:
                break
        return np.array(out, np.int32)

    # ---- HF checkpoint interop ------------------------------------------
    @staticmethod
    def remap_hf_state(state: dict) -> dict:
        """HF T5 state dict -> our names (identity tree; drop the duplicate
        per-stack embedding views and buffer extras)."""
        return {k: v for k, v in state.items()
                if not k.endswith("embed_tokens.weight")
                and ".relative_attention_bias_cache" not in k}

    def export_hf_state(self) -> dict:
        out = dict(self.state_dict())
        # HF checkpoints also carry the per-stack views of the shared table
        out["encoder.embed_tokens.weight"] = out["shared.weight"]
        out["decoder.embed_tokens.weight"] = out["shared.weight"]
        return out

    @staticmethod
    def from_pretrained(name: str = "t5-small"):
        from lightgrad_tpu.utils import fetch, load_torch_state_dict

        url = f"https://huggingface.co/{name}/resolve/main/"
        cfg = T5Config(**json.loads(fetch(url + "config.json")))
        model = T5ForConditionalGeneration(cfg)
        state = load_torch_state_dict(fetch(url + "pytorch_model.bin"))
        model.load_parameters(
            T5ForConditionalGeneration.remap_hf_state(state))
        return model, cfg
