"""Mixtral (LLaMA-MoE) parity vs HuggingFace transformers (CPU torch).

Same protocol as tests/test_{bert,vit,t5}.py: random-init a small HF
MixtralForCausalLM, load through our reader + remap (per-expert w1/w2/w3
Linears stacked into nn.MoE's (E, in, out) tensors, gate -> router),
compare logits.  Routing parity: softmax over all experts, top-k selection,
renormalized gates, NO capacity drops (capacity_factor = E/k).
"""

import io

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import lightgrad_tpu as light
from lightgrad_tpu.autograd import TpuTensor
from lightgrad_tpu.models import Llama, LlamaConfig


def _small_hf():
    cfg = transformers.MixtralConfig(
        vocab_size=96,
        hidden_size=32,
        intermediate_size=56,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=64,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        router_jitter_noise=0.0,
        attention_dropout=0.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    return transformers.MixtralForCausalLM(cfg).eval(), cfg


def _ours_from_hf(hf_model, hf_cfg):
    from lightgrad_tpu.utils import load_torch_state_dict

    buf = io.BytesIO()
    torch.save(hf_model.state_dict(), buf)
    state = load_torch_state_dict(buf.getvalue())

    cfg = LlamaConfig(
        vocab_size=hf_cfg.vocab_size,
        hidden_size=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        num_hidden_layers=hf_cfg.num_hidden_layers,
        num_attention_heads=hf_cfg.num_attention_heads,
        num_key_value_heads=hf_cfg.num_key_value_heads,
        max_position_embeddings=hf_cfg.max_position_embeddings,
        rms_norm_eps=hf_cfg.rms_norm_eps,
        rope_theta=hf_cfg.rope_theta,
        num_local_experts=hf_cfg.num_local_experts,
        num_experts_per_tok=hf_cfg.num_experts_per_tok,
    )
    model = Llama(cfg)
    model.load_parameters(Llama.remap_hf_state(state))
    return model, cfg


def test_mixtral_matches_transformers():
    hf_model, hf_cfg = _small_hf()
    model, cfg = _ours_from_hf(hf_model, hf_cfg)

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 96, (2, 9)).astype(np.int32)
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids.astype(np.int64))).logits.numpy()
    ours = model(TpuTensor.from_numpy(ids, requires_grad=False)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=3e-3, atol=3e-3)
    assert (ours.argmax(-1) == ref.argmax(-1)).all()
    # router losses collected
    assert model.aux_loss is not None and model.z_loss is not None


def test_mixtral_trains_and_generates():
    np.random.seed(0)
    cfg = LlamaConfig(vocab_size=48, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      intermediate_size=48, max_position_embeddings=32,
                      num_local_experts=4, num_experts_per_tok=2)
    m = Llama(cfg)
    rng = np.random.default_rng(2)
    ids_np = rng.integers(0, 48, (4, 8)).astype(np.int32)
    x = TpuTensor.from_numpy(ids_np, requires_grad=False)
    y = TpuTensor.from_numpy(np.roll(ids_np, -1, 1).reshape(-1),
                             requires_grad=False)
    opt = light.optim.Adam(m.parameters(), lr=5e-3)

    def step():
        loss = light.loss.cross_entropy(m(x).reshape(-1, 48), y) \
            + m.aux_loss * 0.01
        opt.zero_grad()
        loss.backward()
        opt.step()
        return loss

    fn = light.jit(step)
    first = fn().item()
    for _ in range(9):
        last = fn().item()
    assert np.isfinite(last) and last < first

    # sliding-window recompute generation runs (the compiled KV path's
    # _kv_functions does not model the MoE FFN yet -- use_cache=False)
    out = m.generate([1, 2, 3], max_new_tokens=4, use_cache=False)
    assert len(out) == 7


def test_llama_moe_ep_rules():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device mesh")
    from jax.sharding import PartitionSpec as P
    from lightgrad_tpu.parallel import (partition_rules, LLAMA_MOE_RULES,
                                        make_mesh, shard_module)

    assert partition_rules(
        LLAMA_MOE_RULES, "layers.0.block_sparse_moe.w1") == P("ep", None, None)
    assert partition_rules(
        LLAMA_MOE_RULES, "layers.0.block_sparse_moe.router.weight") == P()
    assert partition_rules(
        LLAMA_MOE_RULES, "layers.0.self_attn.q_proj.weight") == P("tp", None)

    np.random.seed(1)
    cfg = LlamaConfig(vocab_size=48, hidden_size=16, num_hidden_layers=1,
                      num_attention_heads=2, num_key_value_heads=2,
                      intermediate_size=32, max_position_embeddings=16,
                      num_local_experts=4, num_experts_per_tok=2)
    m = Llama(cfg)
    mesh = make_mesh(dp=2, ep=4)
    shard_module(m, mesh, LLAMA_MOE_RULES)
    w1 = dict(m.named_parameters())["layers.0.block_sparse_moe.w1"]
    assert {s.data.shape for s in w1.data.addressable_shards} == {(1, 16, 32)}


def test_mixtral_compiled_kv_decode_matches_recompute():
    """The one-token compiled step's routed FFN (top-k gather of expert
    stacks) produces exactly the recompute path's greedy tokens."""
    np.random.seed(3)
    cfg = LlamaConfig(vocab_size=48, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      intermediate_size=48, max_position_embeddings=32,
                      num_local_experts=4, num_experts_per_tok=2)
    m = Llama(cfg)
    ids = [3, 17, 29, 8]
    want = [int(t) for t in m.generate(ids, max_new_tokens=8,
                                       use_cache=False)]
    got = [int(t) for t in m.generate(ids, max_new_tokens=8, use_cache=True)]
    assert got == want, (got, want)

    # and through the batched vmap lift
    outs = m.generate_batch([ids, [5, 7]], max_new_tokens=6)
    single = m.generate([5, 7], max_new_tokens=6, use_cache=True)
    assert [int(t) for t in outs[1]] == [int(t) for t in single]
