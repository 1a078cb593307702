"""Qwen2 parity vs HuggingFace transformers (CPU torch, no network).

Qwen2 = the LLaMA recipe + q/k/v attention biases; loading goes through
the same family (`LlamaConfig(attention_bias=True)`, identical HF names).
"""

import io

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from lightgrad_tpu.autograd import TpuTensor
from lightgrad_tpu.models import Llama, LlamaConfig


def test_qwen2_matches_transformers():
    hf_cfg = transformers.Qwen2Config(
        vocab_size=96,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        attention_dropout=0.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = transformers.Qwen2ForCausalLM(hf_cfg).eval()
    # random-init biases are zero in HF Qwen2? make them non-trivial
    with torch.no_grad():
        for layer in hf.model.layers:
            for proj in (layer.self_attn.q_proj, layer.self_attn.k_proj,
                         layer.self_attn.v_proj):
                proj.bias.uniform_(-0.5, 0.5)

    from lightgrad_tpu.utils import load_torch_state_dict

    buf = io.BytesIO()
    torch.save(hf.state_dict(), buf)
    state = load_torch_state_dict(buf.getvalue())

    cfg = LlamaConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_bias=True,
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

    # compiled KV decode includes the biases: token-exact vs recompute
    want = [int(t) for t in model.generate([4, 9, 2], max_new_tokens=6,
                                           use_cache=False)]
    got = [int(t) for t in model.generate([4, 9, 2], max_new_tokens=6,
                                          use_cache=True)]
    assert got == want
