"""Mistral: sliding-window attention, inside the flash kernel.

Mistral = the LLaMA recipe + a banded causal mask (position i attends to
keys in [i-W+1, i]).  The window is masked inside the flash kernel with
whole-block skipping for block pairs entirely below the band -- O(s * W)
compute instead of O(s^2) -- and mirrored in the XLA fallback, the bare
composite, and the KV-cache decode step.  Parity target: HF transformers'
MistralForCausalLM (eager attention applies the same band).
"""

import io

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightgrad_tpu.autograd import TpuTensor
from lightgrad_tpu.models import Llama, LlamaConfig
from lightgrad_tpu.ops import runtime
from lightgrad_tpu.ops.attention import attention_fwd_res


def _naive(q, k, v, scale, window):
    s = q.shape[-2]
    row = jnp.arange(s)[:, None]
    col = jnp.arange(s)[None, :]
    ok = jnp.logical_and(col <= row, row - col < window)
    p = jax.lax.Precision.HIGHEST
    scores = jnp.einsum("bqd,bkd->bqk", q, k, precision=p) * scale
    scores = jnp.where(ok, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", probs, v, precision=p)


@pytest.mark.parametrize("mode", ["pallas", "xla"])
@pytest.mark.parametrize("s,window", [(64, 24), (96, 17), (48, 1)])
def test_windowed_attention_matches_naive(mode, s, window):
    """Flash kernel (interpret) and XLA fallback both honor the band --
    forward values and all three input grads."""
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((2, s, 16)), jnp.float32)
               for _ in range(3))
    scale = 0.25
    prev = runtime.set_kernel_mode(mode)
    try:
        f = lambda a, b, c: attention_fwd_res(
            a, b, c, scale, causal=True, window=window)[0]
        out, vjp = jax.vjp(f, q, k, v)
        ref_out, ref_vjp = jax.vjp(
            lambda a, b, c: _naive(a, b, c, scale, window), q, k, v)
        g = jnp.asarray(rng.standard_normal(out.shape), jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   atol=5e-4, rtol=5e-4)
        for ours, ref in zip(vjp(g), ref_vjp(g)):
            np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                       atol=5e-4, rtol=5e-4)
    finally:
        runtime.set_kernel_mode(prev)


def test_window_equals_seq_is_plain_causal():
    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.standard_normal((1, 64, 16)), jnp.float32)
               for _ in range(3))
    prev = runtime.set_kernel_mode("pallas")
    try:
        o0, _ = attention_fwd_res(q, k, v, 0.25, causal=True, window=0)
        o1, _ = attention_fwd_res(q, k, v, 0.25, causal=True, window=64)
        np.testing.assert_allclose(np.asarray(o0), np.asarray(o1))
    finally:
        runtime.set_kernel_mode(prev)


def test_tape_attention_window_grads():
    """Tape-level attention(window=...) grads match the bare masked-softmax
    composite."""
    rng = np.random.default_rng(2)
    s, d, w = 32, 8, 11
    qn = rng.standard_normal((2, s, d)).astype(np.float32)
    kn = rng.standard_normal((2, s, d)).astype(np.float32)
    vn = rng.standard_normal((2, s, d)).astype(np.float32)

    q1, k1, v1 = (TpuTensor.from_numpy(a, requires_grad=True)
                  for a in (qn, kn, vn))
    out = q1.attention(k1, v1, scale=0.3, causal=True, window=w)
    out.sum().backward()

    q2, k2, v2 = (TpuTensor.from_numpy(a, requires_grad=True)
                  for a in (qn, kn, vn))
    mask = np.triu(np.full((s, s), -1e30, np.float32), k=1) \
        + np.tril(np.full((s, s), -1e30, np.float32), k=-w)
    scores = (q2 @ k2.transpose(0, 2, 1)) * 0.3 \
        + TpuTensor.from_numpy(mask, requires_grad=False)
    ref = scores.softmax(axis=-1) @ v2
    ref.sum().backward()

    np.testing.assert_allclose(out.numpy(), ref.numpy(), atol=5e-4, rtol=5e-4)
    for a, b in ((q1, q2), (k1, k2), (v1, v2)):
        np.testing.assert_allclose(a.grad.numpy(), b.grad.numpy(),
                                   atol=5e-4, rtol=5e-4)


def test_mistral_matches_transformers():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.MistralConfig(
        vocab_size=96,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        sliding_window=8,   # < seq below: the band is actually exercised
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = transformers.MistralForCausalLM(hf_cfg).eval()

    from lightgrad_tpu.utils import load_torch_state_dict

    buf = io.BytesIO()
    torch.save(hf.state_dict(), buf)
    state = load_torch_state_dict(buf.getvalue())

    cfg = LlamaConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        sliding_window=8,
    )
    assert cfg.sliding_window == 8
    model = Llama(cfg)
    model.load_parameters(Llama.remap_hf_state(state))

    rng = np.random.default_rng(3)
    ids = rng.integers(0, 96, (2, 24)).astype(np.int32)  # seq 24 > window 8
    with torch.no_grad():
        ref = hf(torch.tensor(ids.astype(np.int64))).logits.numpy()
    ours = model(TpuTensor.from_numpy(ids, requires_grad=False)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=3e-3, atol=3e-3)
    assert (ours.argmax(-1) == ref.argmax(-1)).all()

    # compiled KV decode applies the same band: token-exact vs recompute
    prompt = [int(t) for t in ids[0, :12]]
    want = [int(t) for t in model.generate(prompt, max_new_tokens=6,
                                           use_cache=False)]
    got = [int(t) for t in model.generate(prompt, max_new_tokens=6,
                                          use_cache=True)]
    assert got == want


def test_qwen2_style_config_disables_window():
    cfg = LlamaConfig(sliding_window=4096, use_sliding_window=False)
    assert cfg.sliding_window is None
