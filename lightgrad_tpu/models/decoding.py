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

__all__ = ["beam_search", "generate_batch", "generate_speculative",
           "generate_speculative_device", "generate_device",
           "generate_batch_device", "ParamFn"]


class ParamFn:
    """Compiled callable whose model parameters enter as a RUNTIME argument.

    ``jax.jit`` embeds closed-over concrete arrays as literal constants in
    the serialized program -- a decode step closing over GPT-2-small's
    weights ships a ~1 GB HLO per compile, which the tunneled chip's
    remote-compile endpoint rejects (HTTP 413).  Binding the params dict as
    the leading pytree argument keeps the program kilobytes-sized, and
    reloaded or resharded weights reuse the same executable.

    Compose with ``.fn`` (the raw ``fn(params, *args)``) plus explicit
    ``.params`` -- e.g. ``jax.vmap(pf.fn, in_axes=(None, 0, ...))`` -- never
    by calling a ParamFn inside another trace (that would re-embed the
    params as constants of the outer program)."""

    def __init__(self, fn, params):
        import jax

        self.fn = fn
        self.params = params
        self.jitted = jax.jit(fn)

    def __call__(self, *args):
        return self.jitted(self.params, *args)


class KVFns:
    """The (init_cache, prefill, step) triple every ``_kv_functions``
    returns, iterable for the ubiquitous 3-way unpack, plus an optional
    ``extend`` member: the parallel multi-token decode pass
    ``extend(p, cache, pos0, toks[K]) -> (cache, logits[K, vocab])`` that
    scores K tokens at positions ``pos0..pos0+K-1`` in ONE batched forward.
    Speculative verification needs it to beat plain decoding: decode is
    weight-read-bound, so scoring k+1 proposals must cost ~one step's HBM
    traffic, not k+1 sequential steps' (see _build_device_spec)."""

    def __init__(self, init_cache, prefill, step, extend=None,
                 step_batch=None):
        self.init_cache = init_cache
        self.prefill = prefill
        self.step = step
        self.extend = extend
        # optional native batched step: ``step_batch(p, caches (B, ...),
        # poss (B,), toks (B,)) -> (caches, logits (B, vocab))`` -- B slots
        # advanced with ONE weight stream (the vmap-of-step lift re-streams
        # weights per slot); callers prefer it over vmap(step.fn)
        self.step_batch = step_batch

    def __iter__(self):
        return iter((self.init_cache, self.prefill, self.step))

    def __getitem__(self, i):
        return (self.init_cache, self.prefill, self.step)[i]


def _log_softmax(x):
    x = np.asarray(x, np.float64)
    m = x.max()
    e = np.exp(x - m)
    return x - m - np.log(e.sum())


def _window(model):
    cfg = model.cfg
    return getattr(cfg, "n_positions", None) or cfg.max_position_embeddings


def _device_sample(logits, key, temperature: float, top_k: int, top_p: float):
    """On-device token sampling: greedy (temperature<=0), temperature,
    top-k truncation, top-p (nucleus) truncation.  Hyperparameters are
    python statics (baked into the program); ``logits`` is a (V,) array and
    ``key`` a jax PRNG key.  Mirrors the host sampler (gpt._sample) minus
    repetition_penalty, which needs the emitted-token history."""
    import jax
    import jax.numpy as jnp

    if temperature <= 0:
        return jnp.argmax(logits).astype(jnp.int32)
    lg = logits.astype(jnp.float32)
    if top_k and top_k < lg.shape[0]:
        kth = jax.lax.top_k(lg, top_k)[0][-1]
        lg = jnp.where(lg < kth, -jnp.inf, lg)
    z = (lg - lg.max()) / temperature
    if 0.0 < top_p < 1.0:
        prob = jax.nn.softmax(z)
        order = jnp.argsort(-prob)
        psort = prob[order]
        # smallest prefix reaching top_p mass (cumsum-exclusive < top_p
        # always keeps the first token), scattered back to vocab order
        keep_sorted = jnp.cumsum(psort) - psort < top_p
        keep = jnp.zeros_like(keep_sorted).at[order].set(keep_sorted)
        z = jnp.where(keep, z, -jnp.inf)
    return jax.random.categorical(key, z).astype(jnp.int32)


def _build_device_gen(model, max_new_tokens: int, temperature: float,
                      top_k: int, top_p: float, eos_id):
    """One pure function running an ENTIRE generation on device:
    prefill + ``lax.scan`` over decode steps with on-device sampling.

    Built over the ``_kv_functions`` contract (GPT, LLaMA/Mistral, NeoX);
    returns ``run(params, cache, toks, n_real, rngkey) -> (W,)-padded prompt
    + max_new_tokens sampled ids``.  After ``eos_id`` every subsequent slot
    holds ``eos_id`` (the carry keeps feeding eos; the host trims)."""
    import jax
    import jax.numpy as jnp

    init_cache, prefill, step = model._kv_fns
    eos = jnp.int32(-1 if eos_id is None else eos_id)

    def run(p, cache, toks, n_real, rngkey):
        cache, logits = prefill.fn(p, cache, toks, n_real)
        rngkey, sub = jax.random.split(rngkey)
        first = _device_sample(logits, sub, temperature, top_k, top_p)
        first = first.astype(jnp.int32)

        def body(carry, _):
            cache, pos, tok, rngkey, done = carry
            cache, logits = step.fn(p, cache, pos, tok)
            rngkey, sub = jax.random.split(rngkey)
            nxt = _device_sample(logits, sub, temperature, top_k, top_p)
            nxt = jnp.where(done, eos, nxt)
            done = done | (nxt == eos)
            return (cache, pos + 1, nxt, rngkey, done), nxt

        done0 = (eos_id is not None) and (first == eos)
        carry0 = (cache, n_real.astype(jnp.int32), first, rngkey,
                  jnp.asarray(done0, bool))
        _, rest = jax.lax.scan(body, carry0, None,
                               length=max_new_tokens - 1)
        return jnp.concatenate([first[None], rest])

    return run


def _build_device_gen_batch(model, max_new_tokens: int, temperature: float,
                            top_k: int, top_p: float, eos_id):
    """Batched twin of ``_build_device_gen`` over the model's native
    ``step_batch``: the decode scan advances ALL B slots through ONE
    weight stream per step (``vmap`` of the single-slot run re-streams
    the weights per slot -- decode is weight-read-bound, so that lift
    left batch-8 barely above single-stream throughput).  Prefill stays
    the vmapped per-slot pass (it is MXU-batched already)."""
    import jax
    import jax.numpy as jnp

    init_cache, prefill, step = model._kv_fns
    sb = model._kv_fns.step_batch
    eos = jnp.int32(-1 if eos_id is None else eos_id)

    def sample_rows(logits, keys):
        splits = jax.vmap(jax.random.split)(keys)
        keys2, subs = splits[:, 0], splits[:, 1]
        nxt = jax.vmap(
            lambda lg, k: _device_sample(lg, k, temperature, top_k, top_p))(
            logits, subs)
        return nxt.astype(jnp.int32), keys2

    def run(p, caches, toks, n_real, keys):
        caches, logits = jax.vmap(prefill.fn, in_axes=(None, 0, 0, 0))(
            p, caches, toks, n_real)
        first, keys = sample_rows(logits, keys)

        def body(carry, _):
            caches, poss, tok, keys, done = carry
            caches, logits = sb.fn(p, caches, poss, tok)
            nxt, keys = sample_rows(logits, keys)
            nxt = jnp.where(done, eos, nxt)
            done = done | (nxt == eos)
            return (caches, poss + 1, nxt, keys, done), nxt

        done0 = (first == eos) if eos_id is not None \
            else jnp.zeros(first.shape, bool)
        carry0 = (caches, n_real.astype(jnp.int32), first, keys, done0)
        _, rest = jax.lax.scan(body, carry0, None,
                               length=max_new_tokens - 1)
        return jnp.concatenate([first[:, None], rest.T], axis=1)  # (B, T)

    return run


def _trim_eos(seq, eos_id):
    out = []
    for t in seq:
        out.append(int(t))
        if eos_id is not None and int(t) == eos_id:
            break
    return out


def generate_device(model, ids, max_new_tokens: int, temperature: float = 0.0,
                    top_k: int = 0, top_p: float = 0.0, eos_id: int = None,
                    seed: int = 0):
    """Whole-generation-on-device decode: ONE dispatch and ONE readback for
    the entire generation.

    ``generate()`` pays a host round-trip per token (dispatch + logits
    readback + host sampling) -- through a tunneled chip that trip, not
    compute, dominates single-stream decode.  Here the prefill, every decode
    step, and the sampling all run inside one compiled program
    (``lax.scan`` over steps, ``jax.random.categorical`` sampling), so the
    host sees only the final (max_new_tokens,) token vector.

    Trade-offs vs ``generate()``: no streaming callback, no
    repetition_penalty (needs host-side history), fixed ``max_new_tokens``
    cost even when eos arrives early (post-eos steps run masked).  The
    program is cached per (prompt-window, hyperparameter) signature.

    Returns prompt + generated ids (eos included, post-eos slots trimmed).
    """
    import jax
    import jax.numpy as jnp

    W = _window(model)
    n_prompt = len(ids)
    assert n_prompt + max_new_tokens <= W, (
        f"prompt+new must fit the window ({n_prompt}+{max_new_tokens} > {W})")
    if not hasattr(model, "_kv_fns"):
        model._kv_fns = model._kv_functions()
    init_cache, prefill, step = model._kv_fns
    sig = ("dev_gen", max_new_tokens, temperature, top_k, top_p, eos_id)
    cached = getattr(model, "_dev_gen", None)
    if cached is None or cached[0] != sig:
        run = _build_device_gen(model, max_new_tokens, temperature, top_k,
                                top_p, eos_id)
        model._dev_gen = (sig, jax.jit(run))
    _, run = model._dev_gen
    toks = jnp.asarray(np.pad(np.asarray(ids, np.int32),
                              (0, W - n_prompt)))
    new = run(prefill.params, init_cache(), toks,
              jnp.int32(n_prompt), jax.random.PRNGKey(seed))
    return list(ids) + _trim_eos(np.asarray(new), eos_id)


def generate_batch_device(model, prompts, max_new_tokens: int,
                          temperature: float = 0.0, top_k: int = 0,
                          top_p: float = 0.0, eos_id: int = None,
                          seed: int = 0):
    """Batched whole-generation-on-device decode: B ragged prompts, ONE
    dispatch for everything.  ``vmap`` of the single-sequence program --
    params broadcast unbatched, caches/positions/keys map over the batch.

    Returns a list of B token lists (prompt + generated, trimmed at eos).
    """
    import jax
    import jax.numpy as jnp

    W = _window(model)
    B = len(prompts)
    lens = [len(p) for p in prompts]
    assert max(lens) + max_new_tokens <= W, (
        f"prompt+new must fit the window ({max(lens)}+{max_new_tokens} > {W})")
    if not hasattr(model, "_kv_fns"):
        model._kv_fns = model._kv_functions()
    init_cache, prefill, step = model._kv_fns
    sig = ("dev_gen_batch", max_new_tokens, temperature, top_k, top_p, eos_id)
    cached = getattr(model, "_dev_gen_batch", None)
    if cached is None or cached[0] != sig:
        if getattr(model._kv_fns, "step_batch", None) is not None:
            runb = _build_device_gen_batch(model, max_new_tokens,
                                           temperature, top_k, top_p,
                                           eos_id)
            model._dev_gen_batch = (sig, jax.jit(runb))
        else:
            run = _build_device_gen(model, max_new_tokens, temperature,
                                    top_k, top_p, eos_id)
            model._dev_gen_batch = (sig, jax.jit(
                jax.vmap(run, in_axes=(None, 0, 0, 0, 0))))
    _, brun = model._dev_gen_batch
    toks = np.zeros((B, W), np.int32)
    for i, pr in enumerate(prompts):
        toks[i, :len(pr)] = pr
    c0 = init_cache()
    # cache may be a pytree (int8 KV cache = (rows, scales)); stack per-leaf
    caches = jax.tree_util.tree_map(
        lambda a: jnp.zeros((B,) + a.shape, a.dtype), c0)
    keys = jnp.stack([jax.random.PRNGKey(seed + i) for i in range(B)])
    new = np.asarray(brun(prefill.params, caches, jnp.asarray(toks),
                          jnp.asarray(lens, np.int32), keys))
    return [list(pr) + _trim_eos(new[i], eos_id)
            for i, pr in enumerate(prompts)]


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
    ``jax.vmap`` -- parameters broadcast unbatched (in_axes=None, passed at
    runtime), per-sequence caches/positions map over the leading axis -- so
    every generated round
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
        # params broadcast (in_axes=None) -- ONE copy in the program, passed
        # at call time; caches/positions/tokens map over the leading axis.
        # Steps prefer the model's native batched program (one weight
        # stream for all B rows) over the vmap lift when it exists.
        sb = getattr(model._kv_fns, "step_batch", None)
        model._kv_batch_fns = (
            jax.jit(jax.vmap(prefill.fn, in_axes=(None, 0, 0, 0))),
            jax.jit(sb.fn) if sb is not None
            else jax.jit(jax.vmap(step.fn, in_axes=(None, 0, 0, 0))))
    bprefill, bstep = model._kv_batch_fns

    toks = np.zeros((B, W), np.int32)
    for i, pr in enumerate(prompts):
        toks[i, :len(pr)] = pr
    c0 = init_cache()
    # cache may be a pytree (int8 KV cache = (rows, scales)); stack per-leaf
    caches = jax.tree_util.tree_map(
        lambda a: jnp.zeros((B,) + a.shape, a.dtype), c0)
    caches, logits = bprefill(prefill.params, caches, jnp.asarray(toks),
                              jnp.asarray(lens, np.int32))
    rng = rng or np.random.default_rng(0)
    outs = [list(p) for p in prompts]
    finished = [False] * B
    for t in range(max_new_tokens):
        if t > 0:
            pos = jnp.asarray([len(o) - 1 for o in outs], np.int32)
            tok = jnp.asarray([o[-1] for o in outs], np.int32)
            caches, logits = bstep(step.params, caches, pos, tok)
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


def generate_speculative(model, draft, ids, max_new_tokens: int, k: int = 4,
                         eos_id: int = None, temperature: float = 0.0,
                         rng=None):
    """Draft-accelerated decoding (speculative decoding,
    https://arxiv.org/abs/2211.17192).

    Each round the cheap ``draft`` proposes ``k`` tokens autoregressively,
    then ``model`` scores all k+1 positions in ONE compiled scan
    (``verify``).

    * ``temperature<=0`` (greedy): the longest draft prefix matching the
      target's own argmax choices is accepted, plus the target's
      correction/bonus token -- the output is EXACTLY plain greedy decoding
      of ``model``, in fewer target dispatches.
    * ``temperature>0`` (sampled): each proposal goes through the
      rejection-sampling rule (``speculative_accept``) against the target's
      tempered softmax, so every emitted token's marginal law is EXACTLY
      the target distribution -- draft quality affects only speed.

    Cache hygiene: rejected proposals leave stale K/V rows beyond the
    accepted position, but the ``<= pos`` attention mask hides them and the
    next round's writes overwrite them before they are ever attended.

    Both models must share a vocabulary.  Returns prompt + generated.
    """
    import jax
    import jax.numpy as jnp

    W = min(_window(model), _window(draft))
    ids = [int(t) for t in ids]
    # + k: the fixed-length verify scan can write up to k rows past the
    # final accepted position; they must stay inside the window (jax clamps
    # out-of-range dynamic_update_slice starts, which would corrupt the
    # last real row)
    assert len(ids) + max_new_tokens + k <= W, (len(ids), max_new_tokens, k, W)
    for m in (model, draft):
        if not hasattr(m, "_kv_fns"):
            m._kv_fns = m._kv_functions()
    t_init, t_prefill, t_step = model._kv_fns
    d_init, d_prefill, d_step = draft._kv_fns

    key = ("_spec_verify", k)
    if getattr(model, "_spec_verify_key", None) != key:
        t_extend = getattr(model._kv_fns, "extend", None)
        if t_extend is not None:
            # ONE batched forward over the k+1 rows (KVFns.extend): one
            # weight read scores every proposal -- the term that lets
            # speculative decoding beat plain decode
            @jax.jit
            def verify_impl(p, cache, pos0, toks):
                return t_extend.fn(p, cache, pos0, toks)
        else:
            @jax.jit
            def verify_impl(p, cache, pos0, toks):
                """Scan k+1 tokens from pos0; returns per-position logits."""
                def body(c, inp):
                    i, tok = inp
                    c, logits = t_step.fn(p, c, pos0 + i, tok)
                    return c, logits

                return jax.lax.scan(
                    body, cache,
                    (jnp.arange(k + 1, dtype=jnp.int32), toks))

        model._spec_verify = lambda *a: verify_impl(t_step.params, *a)
        model._spec_verify_key = key
    verify = model._spec_verify

    rng = rng or np.random.default_rng(0)
    sampled = temperature > 0.0

    def probs(logits):
        z = np.asarray(logits, np.float64) / temperature
        z -= z.max()
        e = np.exp(z)
        return e / e.sum()

    toks = jnp.asarray(np.pad(np.asarray(ids, np.int32), (0, W - len(ids))))
    t_cache, t_logits = t_prefill(t_init(), toks, len(ids))
    d_cache, _ = d_prefill(d_init(), toks, len(ids))

    out = list(ids)
    first = np.asarray(t_logits)
    out.append(int(rng.choice(len(first), p=probs(first))) if sampled
               else int(np.argmax(first)))
    if eos_id is not None and out[-1] == eos_id:
        return out
    while len(out) - len(ids) < max_new_tokens:
        # budget-capped proposal length (never decode past max_new_tokens)
        kk = min(k, max_new_tokens - (len(out) - len(ids)))
        proposals, d_probs, tok, pos = [], [], out[-1], len(out) - 1
        for j in range(kk):
            d_cache, dl = d_step(d_cache, jnp.int32(pos + j), jnp.int32(tok))
            if sampled:
                pd = probs(np.asarray(dl))
                tok = int(rng.choice(len(pd), p=pd))
                d_probs.append(pd)
            else:
                tok = int(np.argmax(np.asarray(dl)))
            proposals.append(tok)
        vt = jnp.asarray(np.asarray(
            [out[-1]] + proposals + [0] * (k - kk), np.int32))
        t_cache, t_rows = verify(t_cache, jnp.int32(len(out) - 1), vt)
        t_rows = np.asarray(t_rows)
        if sampled:
            accepted = []
            for m in range(kk):
                tok, ok = speculative_accept(
                    d_probs[m], probs(t_rows[m]), proposals[m], rng)
                accepted.append(int(tok))
                if not ok:
                    break
            else:
                # every proposal accepted: free bonus token from the target
                pt = probs(t_rows[kk])
                accepted.append(int(rng.choice(len(pt), p=pt)))
        else:
            preds = t_rows.argmax(-1)
            m = 0
            while m < kk and proposals[m] == int(preds[m]):
                m += 1
            # preds[m] is the correction on mismatch, the free bonus token
            # when every proposal was accepted -- valid either way
            accepted = proposals[:m] + [int(preds[m])]
        new = accepted[: max_new_tokens - (len(out) - len(ids))]
        out.extend(new)
        if eos_id is not None and eos_id in new:
            return out[: out.index(eos_id, len(ids)) + 1]
    return out


def _build_device_spec(model, draft, k: int, max_new_tokens: int,
                       temperature: float, eos_id):
    """ONE pure function running an ENTIRE speculative generation on device.

    ``generate_speculative`` pays k draft dispatches + 1 verify dispatch +
    host accept logic PER ROUND -- through a tunneled chip those round-trips,
    not compute, dominate.  Here both prefills, every draft proposal scan,
    every verify scan, and the accept/resample rule run inside one compiled
    program (``lax.while_loop`` over rounds), so the host sees only the
    final token buffer.

    Greedy (``temperature<=0``): longest-matching-prefix acceptance -- the
    output is bit-exact plain greedy decoding of the target.  Sampled: the
    Leviathan et al. rejection rule (accept w.p. min(1, p_t/p_d), resample
    the residual on rejection, bonus-sample when all k accepted), evaluated
    in f32 on device; every emitted token's marginal law is the target's
    tempered softmax (Monte Carlo-tested against ``speculative_accept``).

    Returns ``run(p_t, p_d, t_cache, d_cache, toks_t, toks_d, n_real, key)
    -> (buf, n)`` where ``buf[:min(n, max_new_tokens)]`` are the generated
    ids.  The buffer carries ``k`` slack slots: a round may emit up to k+1
    tokens while ``n < max_new_tokens`` still holds at entry; the tail past
    ``n`` is overwritten-or-garbage by construction and trimmed host-side.
    """
    import jax
    import jax.numpy as jnp

    t_init, t_prefill, t_step = model._kv_fns
    d_init, d_prefill, d_step = draft._kv_fns
    t_extend = getattr(model._kv_fns, "extend", None)
    eos = jnp.int32(-1 if eos_id is None else eos_id)
    greedy = temperature <= 0.0
    BUF = max_new_tokens + k

    def run(pt, pd, t_cache, d_cache, toks_t, toks_d, n_real, key):
        t_cache, t_logits = t_prefill.fn(pt, t_cache, toks_t, n_real)
        d_cache, _ = d_prefill.fn(pd, d_cache, toks_d, n_real)
        key, sub = jax.random.split(key)
        first = _device_sample(t_logits, sub, temperature, 0, 0.0)
        out = jnp.zeros((BUF,), jnp.int32).at[0].set(first)
        done0 = first == eos

        def cond(c):
            _, _, _, n, _, _, done = c
            return (n < max_new_tokens) & ~done

        def body(c):
            t_cache, d_cache, out, n, last, key, done = c
            pos = n_real.astype(jnp.int32) + n - 1  # abs position of `last`

            def dbody(carry, i):
                d_cache, tok, key = carry
                d_cache, dl = d_step.fn(pd, d_cache, pos + i, tok)
                if greedy:
                    nxt = jnp.argmax(dl).astype(jnp.int32)
                else:
                    key, sub = jax.random.split(key)
                    nxt = jax.random.categorical(
                        sub, dl.astype(jnp.float32) / temperature
                    ).astype(jnp.int32)
                return (d_cache, nxt, key), (nxt, dl)

            (d_cache, _, key), (props, dlogits) = jax.lax.scan(
                dbody, (d_cache, last, key), jnp.arange(k, dtype=jnp.int32))

            # target scores all k+1 positions: feed [last, props[:-1]...k].
            # The extend pass scores them in ONE batched forward -- one
            # weight read for k+1 rows, the term that makes speculative
            # decoding pay off on a weight-read-bound decode.  Models
            # without an extend fall back to the sequential scan (correct,
            # but each round then costs k+1 full step reads).
            vt = jnp.concatenate([last[None], props])

            if t_extend is not None:
                t_cache, trows = t_extend.fn(pt, t_cache, pos, vt)
            else:
                def tbody(cache, inp):
                    i, tok = inp
                    cache, lg = t_step.fn(pt, cache, pos + i, tok)
                    return cache, lg

                t_cache, trows = jax.lax.scan(
                    tbody, t_cache,
                    (jnp.arange(k + 1, dtype=jnp.int32), vt))

            if greedy:
                preds = jnp.argmax(trows, axis=-1).astype(jnp.int32)
                matches = props == preds[:k]
                m = jnp.where(jnp.all(matches), k,
                              jnp.argmin(matches)).astype(jnp.int32)
                emit = jnp.concatenate(
                    [props, jnp.zeros((1,), jnp.int32)]).at[m].set(preds[m])
            else:
                tp = jax.nn.softmax(
                    trows.astype(jnp.float32) / temperature, axis=-1)
                dp = jax.nn.softmax(
                    dlogits.astype(jnp.float32) / temperature, axis=-1)
                key, su, s1, s2 = jax.random.split(key, 4)
                us = jax.random.uniform(su, (k,))
                arange_k = jnp.arange(k)
                px_t = tp[arange_k, props]
                px_d = dp[arange_k, props]
                accept = us < jnp.minimum(1.0, px_t / jnp.maximum(px_d, 1e-20))
                m = jnp.where(jnp.all(accept), k,
                              jnp.argmin(accept)).astype(jnp.int32)
                # rejection at m<k: resample the residual max(p_t - p_d, 0);
                # degenerate all-zero residual keeps the proposal (identical
                # distributions cannot truly reject -- f32 guard only)
                mr = jnp.minimum(m, k - 1)
                resid = jnp.maximum(tp[mr] - dp[mr], 0.0)
                rtok = jax.random.categorical(
                    s1, jnp.log(jnp.maximum(resid, 1e-38))).astype(jnp.int32)
                rtok = jnp.where(resid.sum() > 0, rtok, props[mr])
                # all k accepted: free bonus token from the target's k-th row
                btok = jax.random.categorical(
                    s2, jnp.log(jnp.maximum(tp[k], 1e-38))).astype(jnp.int32)
                corr = jnp.where(m == k, btok, rtok)
                emit = jnp.concatenate(
                    [props, jnp.zeros((1,), jnp.int32)]).at[m].set(corr)

            # emit[:m+1] are real; the tail is garbage that the next round's
            # write (starting at n+m+1) overwrites, or the host trims
            out = jax.lax.dynamic_update_slice(out, emit, (n,))
            done = done | jnp.any((emit == eos) & (jnp.arange(k + 1) <= m))
            return (t_cache, d_cache, out, n + m + 1, emit[m], key, done)

        carry = (t_cache, d_cache, out, jnp.int32(1), first, key, done0)
        t_cache, d_cache, out, n, last, key, done = jax.lax.while_loop(
            cond, body, carry)
        return out, n

    return run


def generate_speculative_device(model, draft, ids, max_new_tokens: int,
                                k: int = 4, temperature: float = 0.0,
                                eos_id: int = None, seed: int = 0):
    """Whole-generation speculative decoding in ONE device program (see
    ``_build_device_spec``): ONE dispatch and ONE readback for the entire
    draft-accelerated generation.  Greedy output is bit-exact vs
    ``generate_device(model, ...)``; sampled output is marginally exact.

    Both models must share a vocabulary.  Returns prompt + generated ids.
    """
    import jax
    import jax.numpy as jnp

    assert k >= 1, "need at least one draft proposal per round"
    Wt, Wd = _window(model), _window(draft)
    ids = [int(t) for t in ids]
    # + k: a verify scan can write up to k rows past the final accepted
    # position; they must stay inside both windows
    assert len(ids) + max_new_tokens + k <= min(Wt, Wd), (
        len(ids), max_new_tokens, k, Wt, Wd)
    for m in (model, draft):
        if not hasattr(m, "_kv_fns"):
            m._kv_fns = m._kv_functions()
    sig = ("dev_spec", k, max_new_tokens, temperature, eos_id, id(draft))
    cached = getattr(model, "_dev_spec", None)
    if cached is None or cached[0] != sig:
        run = _build_device_spec(model, draft, k, max_new_tokens,
                                 temperature, eos_id)
        model._dev_spec = (sig, jax.jit(run))
    _, run = model._dev_spec

    t_init, t_prefill, _ = model._kv_fns
    d_init, d_prefill, _ = draft._kv_fns
    arr = np.asarray(ids, np.int32)
    toks_t = jnp.asarray(np.pad(arr, (0, Wt - len(ids))))
    toks_d = jnp.asarray(np.pad(arr, (0, Wd - len(ids))))
    buf, n = run(t_prefill.params, d_prefill.params, t_init(), d_init(),
                 toks_t, toks_d, jnp.int32(len(ids)),
                 jax.random.PRNGKey(seed))
    new = np.asarray(buf)[: min(int(n), max_new_tokens)]
    return list(ids) + _trim_eos(new, eos_id)


def speculative_accept(p_draft, p_target, proposed, rng):
    """One speculative rejection-sampling decision (Leviathan et al. 2023,
    arXiv:2211.17192 App. A).  ``proposed`` was sampled from ``p_draft``;
    accept it with probability ``min(1, p_t[x] / p_d[x])``, otherwise
    resample from the residual ``normalize(max(p_t - p_d, 0))``.  The
    marginal law of the returned token is EXACTLY ``p_target`` (verified by
    Monte Carlo enumeration in tests/test_gpt.py).

    Returns ``(token, accepted)``."""
    x = int(proposed)
    if rng.random() < min(1.0, float(p_target[x]) / max(float(p_draft[x]), 1e-20)):
        return x, True
    resid = np.maximum(np.asarray(p_target, np.float64)
                       - np.asarray(p_draft, np.float64), 0.0)
    s = resid.sum()
    if s <= 0.0:  # distributions identical: rejection cannot occur, but
        return x, True  # guard the degenerate float case anyway
    return int(rng.choice(len(resid), p=resid / s)), False
