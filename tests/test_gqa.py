"""Grouped-query attention (GQA): the flash kernels serve n_heads/n_kv query
heads from ONE K/V head via BlockSpec index maps (ops/attention.py), so no
gather-expanded K/V copy exists in HBM and dK/dV accumulate in-kernel (no
scatter-add).  Every path is validated against the explicit repeat-expanded
computation it replaces.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lightgrad_tpu.ops import runtime
from lightgrad_tpu.ops.attention import (
    attention_fwd,
    attention_fwd_res,
    attention_bwd,
)

np.random.seed(7)


def rnd(*shape):
    return jnp.asarray(np.random.uniform(-1, 1, shape).astype(np.float32))


def expand(x, groups):
    """(BKV, s, d) -> (BKV*groups, s, d) repeat-expanded (the r3 path)."""
    return jnp.repeat(x, groups, axis=0)


@pytest.mark.parametrize("mode", ["xla", "pallas"])
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("bq,groups,s,d", [
    (8, 4, 64, 32),     # aligned
    (6, 3, 33, 64),     # ragged sequence
    (4, 2, 300, 64),    # multi-block
])
def test_gqa_fwd_matches_expanded(mode, causal, bq, groups, s, d):
    prev = runtime.set_kernel_mode(mode)
    try:
        q = rnd(bq, s, d)
        k, v = rnd(bq // groups, s, d), rnd(bq // groups, s, d)
        scale = 1.0 / np.sqrt(d)
        got, lse = attention_fwd_res(q, k, v, scale, causal=causal)
        want, wlse = attention_fwd_res(q, expand(k, groups),
                                       expand(v, groups), scale,
                                       causal=causal)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(lse).reshape(bq, s),
                                   np.asarray(wlse).reshape(bq, s),
                                   rtol=2e-5, atol=2e-5)
    finally:
        runtime.set_kernel_mode(prev)


@pytest.mark.parametrize("mode", ["xla", "pallas"])
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("bq,groups,s,d", [(8, 4, 64, 32), (4, 2, 150, 64)])
def test_gqa_bwd_matches_expanded(mode, causal, bq, groups, s, d):
    """dq matches the expanded run; dk/dv match the group-sum of the
    expanded run's per-query-head gradients (the scatter-add this kernel
    replaces)."""
    prev = runtime.set_kernel_mode(mode)
    try:
        q, g = rnd(bq, s, d), rnd(bq, s, d)
        k, v = rnd(bq // groups, s, d), rnd(bq // groups, s, d)
        scale = 1.0 / np.sqrt(d)
        out, lse = attention_fwd_res(q, k, v, scale, causal=causal)
        dq, dk, dv = attention_bwd(g, q, k, v, scale, causal=causal,
                                   out=out, lse=lse)
        ke, ve = expand(k, groups), expand(v, groups)
        oute, lsee = attention_fwd_res(q, ke, ve, scale, causal=causal)
        dqe, dke, dve = attention_bwd(g, q, ke, ve, scale, causal=causal,
                                      out=oute, lse=lsee)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(dqe),
                                   rtol=2e-4, atol=2e-4)
        for got_g, exp_g, name in ((dk, dke, "dk"), (dv, dve, "dv")):
            want = np.asarray(exp_g).reshape(bq // groups, groups, s, d
                                             ).sum(axis=1)
            np.testing.assert_allclose(np.asarray(got_g), want,
                                       rtol=2e-4, atol=2e-4, err_msg=name)
    finally:
        runtime.set_kernel_mode(prev)


@pytest.mark.parametrize("mode", ["xla", "pallas"])
def test_gqa_sliding_window(mode):
    """GQA composes with the sliding-window band (the Mistral config)."""
    prev = runtime.set_kernel_mode(mode)
    try:
        bq, groups, s, d, win = 4, 2, 96, 32, 24
        q = rnd(bq, s, d)
        k, v = rnd(bq // groups, s, d), rnd(bq // groups, s, d)
        got = attention_fwd(q, k, v, 0.3, causal=True, window=win)
        want = attention_fwd(q, expand(k, groups), expand(v, groups), 0.3,
                             causal=True, window=win)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
    finally:
        runtime.set_kernel_mode(prev)


@pytest.mark.parametrize("mode", ["xla", "pallas"])
def test_gqa_lengths(mode):
    """GQA composes with per-example lengths (right-padded batches)."""
    prev = runtime.set_kernel_mode(mode)
    try:
        b, h, kvh, s, d = 2, 4, 2, 64, 32
        groups = h // kvh
        q = rnd(b * h, s, d)
        k, v = rnd(b * kvh, s, d), rnd(b * kvh, s, d)
        lens = jnp.asarray(np.repeat([37, 64], h), jnp.int32)  # per q row
        got = attention_fwd(q, k, v, 0.25, causal=True, lengths=lens)
        want = attention_fwd(q, expand(k, groups), expand(v, groups), 0.25,
                             causal=True, lengths=lens)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
    finally:
        runtime.set_kernel_mode(prev)


def test_gqa_tape_gradcheck():
    """The tape-level attention op accepts k/v with fewer heads and passes
    gradcheck on every operand (numeric vs analytic)."""
    from lightgrad_tpu.autograd import TpuTensor
    from lightgrad_tpu.utils.gradcheck import assert_gradcheck

    np.random.seed(11)
    q = TpuTensor.from_numpy(
        np.random.uniform(-1, 1, (2, 4, 5, 8)).astype(np.float32))
    k = TpuTensor.from_numpy(
        np.random.uniform(-1, 1, (2, 2, 5, 8)).astype(np.float32))
    v = TpuTensor.from_numpy(
        np.random.uniform(-1, 1, (2, 2, 5, 8)).astype(np.float32))
    assert_gradcheck(lambda t: t.attention(k, v, scale=0.5), q,
                     atol=2e-3, rtol=2e-3)
    assert_gradcheck(lambda t: q.attention(t, v, scale=0.5), k,
                     atol=2e-3, rtol=2e-3)
    assert_gradcheck(lambda t: q.attention(k, t, scale=0.5), v,
                     atol=2e-3, rtol=2e-3)


def test_llama_gqa_forward_matches_expanded_reference():
    """Llama forward with n_kv < n_heads: the fused GQA path equals the
    materialized repeat-expanded score computation (the pre-r4 path, still
    reachable through the raw-score branch)."""
    from lightgrad_tpu import models
    from lightgrad_tpu.autograd import TpuTensor

    np.random.seed(3)
    cfg = models.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=32)
    model = models.Llama(cfg)
    ids = np.random.randint(0, 64, (2, 16)).astype(np.int32)
    x = TpuTensor.from_numpy(ids, requires_grad=False)
    logits = np.asarray(model(x).data)

    # reference: same weights through the raw-score branch (repeat-expanded
    # K/V + materialized mask), reached by hiding the fused op
    from lightgrad_tpu.autograd import TpuTensor as T

    fused = T.attention
    try:
        del T.attention
        want = np.asarray(model(x).data)
    finally:
        T.attention = fused
    np.testing.assert_allclose(logits, want, rtol=3e-4, atol=3e-4)


def test_llama_gqa_decode_matches_forward():
    """KV-cache decode (grouped einsum, single-DUS cache) agrees with the
    full forward's next-token argmax at every step."""
    from lightgrad_tpu import models
    from lightgrad_tpu.autograd import TpuTensor

    np.random.seed(5)
    cfg = models.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=24)
    model = models.Llama(cfg)
    prompt = [3, 17, 42, 9]
    got = model.generate(prompt, max_new_tokens=6, use_cache=True)
    want = model.generate(prompt, max_new_tokens=6, use_cache=False)
    assert got == want
