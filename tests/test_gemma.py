"""Gemma parity vs HuggingFace transformers (CPU torch, no network).

Gemma = the LLaMA recipe with (1 + w) RMSNorm deltas, tanh-gelu gated MLP,
sqrt(hidden) embedding scaling, an explicit head_dim, and tied embeddings;
all are LlamaConfig switches, so Gemma checkpoints load through the same
family.
"""

import io

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from lightgrad_tpu.autograd import TpuTensor
from lightgrad_tpu.models import Llama, LlamaConfig


def test_gemma_matches_transformers():
    hf_cfg = transformers.GemmaConfig(
        vocab_size=96,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=8,
        max_position_embeddings=64,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        hidden_act="gelu_pytorch_tanh",
        attention_dropout=0.0,
        tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    hf = transformers.GemmaForCausalLM(hf_cfg).eval()
    with torch.no_grad():  # zero-init norm deltas hide the offset: perturb
        for layer in hf.model.layers:
            layer.input_layernorm.weight.uniform_(-0.3, 0.3)
            layer.post_attention_layernorm.weight.uniform_(-0.3, 0.3)
        hf.model.norm.weight.uniform_(-0.3, 0.3)

    from lightgrad_tpu.utils import load_torch_state_dict

    buf = io.BytesIO()
    torch.save(hf.state_dict(), buf)
    state = load_torch_state_dict(buf.getvalue())

    cfg = LlamaConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=64, rms_norm_eps=1e-6,
        rope_theta=10000.0, hidden_act="gelu_pytorch_tanh", rms_offset=True,
        scale_embeddings=True, tie_word_embeddings=True,
    )
    model = Llama(cfg)
    model.load_parameters(Llama.remap_hf_state(state))

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 96, (2, 8)).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.tensor(ids.astype(np.int64))).logits.numpy()
    ours = model(TpuTensor.from_numpy(ids, requires_grad=False)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=3e-3, atol=3e-3)
    assert (ours.argmax(-1) == ref.argmax(-1)).all()

    # compiled KV decode mirrors every Gemma switch: token-exact
    want = [int(t) for t in model.generate([4, 9, 2], max_new_tokens=6,
                                           use_cache=False)]
    got = [int(t) for t in model.generate([4, 9, 2], max_new_tokens=6,
                                          use_cache=True)]
    assert got == want


def test_gemma_head_dim_override_trains():
    """head_dim != hidden/heads trains through the tape (q/o shapes)."""
    import lightgrad_tpu as light

    np.random.seed(0)
    cfg = LlamaConfig(vocab_size=32, hidden_size=24, intermediate_size=48,
                      num_hidden_layers=1, num_attention_heads=3,
                      num_key_value_heads=3, head_dim=16,
                      max_position_embeddings=16, rms_offset=True,
                      scale_embeddings=True, hidden_act="gelu",
                      tie_word_embeddings=True)
    m = Llama(cfg)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 32, (2, 6)).astype(np.int32)
    x = TpuTensor.from_numpy(ids, requires_grad=False)
    y = TpuTensor.from_numpy(np.roll(ids, -1, 1).reshape(-1),
                             requires_grad=False)
    opt = light.optim.Adam(m.parameters(), lr=5e-3)
    first = last = None
    for _ in range(8):
        loss = light.loss.cross_entropy(m(x).reshape(-1, 32), y)
        opt.zero_grad()
        loss.backward()
        opt.step()
        first = first if first is not None else loss.item()
        last = loss.item()
    assert np.isfinite(last) and last < first
