"""Fused single-token decode attention kernel (ops/decode_attention.py):
pallas (interpret off-TPU) vs the XLA einsum chain it replaces, including
GQA grouping, sliding window, scan-loop usage, and vmap batching (the
serving engine vmaps the decode step over slots)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightgrad_tpu.ops import runtime
from lightgrad_tpu.ops.decode_attention import decode_attention, _xla_impl

np.random.seed(21)


def rnd(*shape):
    return jnp.asarray(np.random.uniform(-1, 1, shape).astype(np.float32))


@pytest.mark.parametrize("kv,g,w,hd,pos", [
    (12, 1, 256, 64, 0),      # GPT-2 shape, first token
    (12, 1, 256, 64, 97),     # mid-window
    (2, 4, 64, 32, 31),       # GQA, last row
    (4, 2, 96, 128, 50),      # wide head
])
def test_decode_attention_matches_xla(kv, g, w, hd, pos):
    prev = runtime.set_kernel_mode("pallas")
    try:
        q, kc, vc = rnd(kv, g, hd), rnd(kv, w, hd), rnd(kv, w, hd)
        scale = 1.0 / np.sqrt(hd)
        got = decode_attention(q, kc, vc, jnp.int32(pos), scale)
        want = _xla_impl(q, kc, vc, jnp.int32(pos), scale, 0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
    finally:
        runtime.set_kernel_mode(prev)


def test_decode_attention_window():
    prev = runtime.set_kernel_mode("pallas")
    try:
        kv, g, w, hd, win = 3, 2, 64, 32, 16
        q, kc, vc = rnd(kv, g, hd), rnd(kv, w, hd), rnd(kv, w, hd)
        for pos in (5, 40):
            got = decode_attention(q, kc, vc, jnp.int32(pos), 0.3, window=win)
            want = _xla_impl(q, kc, vc, jnp.int32(pos), 0.3, win)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-5, atol=2e-5,
                                       err_msg=f"pos={pos}")
    finally:
        runtime.set_kernel_mode(prev)


def test_decode_attention_under_scan_and_vmap():
    """One compiled kernel serves every scan step (pos is an SMEM scalar)
    and vmaps over a batch axis (the serving engine's slot dimension)."""
    prev = runtime.set_kernel_mode("pallas")
    try:
        kv, g, w, hd, B = 2, 2, 32, 32, 3
        kc, vc = rnd(kv, w, hd), rnd(kv, w, hd)
        qs = rnd(5, kv, g, hd)

        def body(_, inp):
            pos, q = inp
            return None, decode_attention(q, kc, vc, pos, 0.5)

        _, outs = jax.jit(lambda qs: jax.lax.scan(
            body, None, (jnp.arange(5, dtype=jnp.int32) + 3, qs)))(qs)
        for i in range(5):
            want = _xla_impl(qs[i], kc, vc, jnp.int32(3 + i), 0.5, 0)
            np.testing.assert_allclose(np.asarray(outs[i]), np.asarray(want),
                                       rtol=2e-5, atol=2e-5)

        # vmap over a leading batch of caches/positions (params broadcast)
        bq = rnd(B, kv, g, hd)
        bk, bv = rnd(B, kv, w, hd), rnd(B, kv, w, hd)
        bpos = jnp.asarray([2, 9, 30], jnp.int32)
        bout = jax.jit(jax.vmap(
            lambda q, k, v, p: decode_attention(q, k, v, p, 0.5)
        ))(bq, bk, bv, bpos)
        for i in range(B):
            want = _xla_impl(bq[i], bk[i], bv[i], bpos[i], 0.5, 0)
            np.testing.assert_allclose(np.asarray(bout[i]), np.asarray(want),
                                       rtol=2e-5, atol=2e-5)
    finally:
        runtime.set_kernel_mode(prev)


@pytest.mark.parametrize("model_kind", ["gpt", "llama"])
def test_decode_path_under_pallas_matches_xla(model_kind):
    """The whole compiled KV decode (prefill + steps) emits the same tokens
    under pallas kernels as under xla -- the decode_attention integration
    in models/{gpt,llama}.py is numerically faithful."""
    from lightgrad_tpu import models

    np.random.seed(33)
    if model_kind == "gpt":
        model = models.GPT(models.GPTConfig(
            vocab_size=64, n_positions=32, n_embd=32, n_layer=2, n_head=4))
    else:
        model = models.Llama(models.LlamaConfig(
            vocab_size=64, hidden_size=32, intermediate_size=48,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=32))
    prompt = [5, 9, 33, 2]
    want = model.generate(prompt, max_new_tokens=6, use_cache=True)
    prev = runtime.set_kernel_mode("pallas")
    try:
        for attr in ("_kv_fns", "_kv_batch_fns"):
            if hasattr(model, attr):
                delattr(model, attr)
        got = model.generate(prompt, max_new_tokens=6, use_cache=True)
    finally:
        runtime.set_kernel_mode(prev)
        for attr in ("_kv_fns", "_kv_batch_fns"):
            if hasattr(model, attr):
                delattr(model, attr)
    assert got == want
