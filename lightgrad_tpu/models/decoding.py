"""Beam-search decoding over the compiled KV-cache step.

Works with any model exposing the ``_kv_functions`` contract (GPT, Llama):
``init_cache() -> cache``, ``prefill(cache, padded_toks, n_real) ->
(cache, last_logits)``, ``step(cache, pos, tok) -> (cache, logits)`` -- all
jit-compiled with fixed shapes, so beam search reuses the exact same two
compiled programs as sampling; the beam bookkeeping (top-k per beam,
hypothesis reordering) is host-side numpy over O(beam) tiny arrays.

Caches are immutable jax arrays, so "copying" a beam's cache is a reference
copy and reordering beams is free -- no cache gather/scatter pass like
mutable-cache implementations need.

No counterpart in the reference (its only decode loop is greedy BERT MLM
infill, ``/root/reference/examples/bert.py:374-383``).
"""

import numpy as np

__all__ = ["beam_search", "generate_batch"]


def _log_softmax(x):
    x = np.asarray(x, np.float64)
    m = x.max()
    e = np.exp(x - m)
    return x - m - np.log(e.sum())


def _window(model):
    cfg = model.cfg
    return getattr(cfg, "n_positions", None) or cfg.max_position_embeddings


def beam_search(model, ids, max_new_tokens: int, beam_size: int = 4,
                eos_id: int = None, length_penalty: float = 1.0):
    """Length-normalized beam search; returns the best token sequence
    (prompt + generated).  ``length_penalty`` > 1 favors longer outputs;
    hypotheses are scored ``logprob / n_generated**length_penalty``.

    ``beam_size=1`` is exactly greedy decoding."""
    import jax.numpy as jnp

    ids = list(ids)
    W = _window(model)
    assert len(ids) + max_new_tokens <= W, (
        f"beam search needs prompt+new <= window ({len(ids)}+{max_new_tokens}"
        f" > {W})")
    if not hasattr(model, "_kv_fns"):
        model._kv_fns = model._kv_functions()
    init_cache, prefill, step = model._kv_fns

    toks = jnp.asarray(np.pad(np.asarray(ids, np.int32), (0, W - len(ids))))
    cache, logits = prefill(init_cache(), toks, len(ids))
    lp = _log_softmax(logits)
    first = np.argsort(lp)[::-1][:beam_size]
    # beam: (token list, cumulative logprob, cache)
    beams = [(ids + [int(t)], float(lp[t]), cache) for t in first]
    done = []

    def finalize(seq, score):
        n_gen = len(seq) - len(ids)
        done.append((seq, score / n_gen ** length_penalty))

    for _ in range(max_new_tokens - 1):
        candidates = []
        for seq, score, c in beams:
            if eos_id is not None and seq[-1] == eos_id:
                finalize(seq, score)
                continue
            pos = jnp.int32(len(seq) - 1)
            c2, logits = step(c, pos, jnp.int32(seq[-1]))
            lp = _log_softmax(logits)
            for t in np.argsort(lp)[::-1][:beam_size]:
                candidates.append((seq + [int(t)], score + float(lp[t]), c2))
        if not candidates:
            break
        candidates.sort(key=lambda b: b[1], reverse=True)
        beams = candidates[:beam_size]
        if len(done) >= beam_size:
            break
    for seq, score, _ in beams:
        if eos_id is None or seq[-1] != eos_id:  # eos'd beams already final
            finalize(seq, score)
    return max(done, key=lambda d: d[1])[0]


def generate_batch(model, prompts, max_new_tokens: int,
                   temperature: float = 0.0, rng=None, top_k: int = 0,
                   top_p: float = 0.0, eos_id: int = None):
    """Batched compiled KV decoding over the ``_kv_functions`` contract
    (GPT, Llama): B ragged prompts decode together.

    The single-sequence compiled programs are lifted over the batch with
    ``jax.vmap`` -- parameters broadcast as closure constants, per-sequence
    caches/positions map over the leading axis -- so every generated round
    costs ONE program dispatch for the whole batch (serving throughput)
    instead of B.  Finished rows re-write their last cache slot harmlessly
    until every row hits ``eos_id``.

    Returns a list of B token lists (prompt + generated, eos included).
    """
    import jax
    import jax.numpy as jnp

    from .gpt import _sample

    W = _window(model)
    B = len(prompts)
    lens = [len(p) for p in prompts]
    assert max(lens) + max_new_tokens <= W, (
        f"prompt+new must fit the window ({max(lens)}+{max_new_tokens} > {W})")
    if not hasattr(model, "_kv_fns"):
        model._kv_fns = model._kv_functions()
    init_cache, prefill, step = model._kv_fns
    if not hasattr(model, "_kv_batch_fns"):
        model._kv_batch_fns = (jax.jit(jax.vmap(prefill)),
                               jax.jit(jax.vmap(step)))
    bprefill, bstep = model._kv_batch_fns

    toks = np.zeros((B, W), np.int32)
    for i, pr in enumerate(prompts):
        toks[i, :len(pr)] = pr
    c0 = init_cache()
    caches = jnp.zeros((B,) + c0.shape, c0.dtype)
    caches, logits = bprefill(caches, jnp.asarray(toks),
                              jnp.asarray(lens, np.int32))
    rng = rng or np.random.default_rng(0)
    outs = [list(p) for p in prompts]
    finished = [False] * B
    for t in range(max_new_tokens):
        if t > 0:
            pos = jnp.asarray([len(o) - 1 for o in outs], np.int32)
            tok = jnp.asarray([o[-1] for o in outs], np.int32)
            caches, logits = bstep(caches, pos, tok)
        lg = np.asarray(logits)
        for i in range(B):
            if finished[i]:
                continue
            nxt = _sample(lg[i], temperature, rng, top_k=top_k, top_p=top_p)
            outs[i].append(int(nxt))
            if eos_id is not None and outs[i][-1] == eos_id:
                finished[i] = True
        if all(finished):
            break
    return outs
