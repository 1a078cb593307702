"""GPT-NeoX / Pythia parity vs HuggingFace transformers (CPU torch).

Covers the family's distinguishing pieces: per-head-packed fused QKV,
partial rotary (rotary_pct < 1), parallel vs serial residual, exact-erf
GELU, untied head.
"""

import io

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import lightgrad_tpu as light
from lightgrad_tpu.autograd import TpuTensor
from lightgrad_tpu.models import NeoX, NeoXConfig


def _pair(rotary_pct, parallel):
    hf_cfg = transformers.GPTNeoXConfig(
        vocab_size=96,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=64,
        rotary_pct=rotary_pct,
        rotary_emb_base=10000,
        layer_norm_eps=1e-5,
        use_parallel_residual=parallel,
        attention_dropout=0.0,
        hidden_dropout=0.0,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    hf = transformers.GPTNeoXForCausalLM(hf_cfg).eval()

    from lightgrad_tpu.utils import load_torch_state_dict

    buf = io.BytesIO()
    torch.save(hf.state_dict(), buf)
    state = load_torch_state_dict(buf.getvalue())

    cfg = NeoXConfig(vocab_size=96, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     max_position_embeddings=64, rotary_pct=rotary_pct,
                     use_parallel_residual=parallel)
    model = NeoX(cfg)
    model.load_parameters(NeoX.remap_hf_state(state))
    return hf, model


@pytest.mark.parametrize("rotary_pct,parallel",
                         [(0.5, True), (1.0, True), (0.5, False)])
def test_neox_matches_transformers(rotary_pct, parallel):
    hf, model = _pair(rotary_pct, parallel)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 96, (2, 8)).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.tensor(ids.astype(np.int64))).logits.numpy()
    ours = model(TpuTensor.from_numpy(ids, requires_grad=False)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=3e-3, atol=3e-3)
    assert (ours.argmax(-1) == ref.argmax(-1)).all()


def test_neox_trains_and_generates():
    np.random.seed(0)
    cfg = NeoXConfig(vocab_size=48, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     max_position_embeddings=32, rotary_pct=0.25)
    m = NeoX(cfg)
    rng = np.random.default_rng(2)
    ids_np = rng.integers(0, 48, (4, 8)).astype(np.int32)
    x = TpuTensor.from_numpy(ids_np, requires_grad=False)
    y = TpuTensor.from_numpy(np.roll(ids_np, -1, 1).reshape(-1),
                             requires_grad=False)
    opt = light.optim.Adam(m.parameters(), lr=5e-3)

    def step():
        loss = light.loss.cross_entropy(m(x).reshape(-1, 48), y)
        opt.zero_grad()
        loss.backward()
        opt.step()
        return loss

    fn = light.jit(step)
    first = fn().item()
    for _ in range(9):
        last = fn().item()
    assert np.isfinite(last) and last < first

    out = m.generate([3, 5, 7], max_new_tokens=4)
    assert len(out) == 7 and all(0 <= t < 48 for t in out)


def test_neox_hf_export_roundtrip():
    hf, model = _pair(0.5, True)
    exported = {k: torch.tensor(np.asarray(v))
                for k, v in model.export_hf_state().items()}
    torch.manual_seed(3)
    hf2 = transformers.GPTNeoXForCausalLM(hf.config).eval()
    missing, unexpected = hf2.load_state_dict(exported, strict=False)
    assert not unexpected, unexpected

    rng = np.random.default_rng(4)
    ids = torch.tensor(rng.integers(0, 96, (1, 6)).astype(np.int64))
    with torch.no_grad():
        np.testing.assert_allclose(hf(ids).logits.numpy(),
                                   hf2(ids).logits.numpy(),
                                   rtol=1e-5, atol=1e-5)


def test_neox_tensor_parallel_train_step():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device mesh")
    from jax.sharding import PartitionSpec as P
    from lightgrad_tpu.parallel import (make_mesh, shard_module,
                                        partition_rules, NEOX_TP_RULES)

    assert partition_rules(
        NEOX_TP_RULES,
        "layers.0.attention.query_key_value.weight") == P("tp", None)
    assert partition_rules(
        NEOX_TP_RULES, "layers.0.attention.dense.weight") == P(None, "tp")
    assert partition_rules(
        NEOX_TP_RULES, "layers.0.input_layernorm.weight") == P()

    np.random.seed(1)
    cfg = NeoXConfig(vocab_size=48, hidden_size=16, intermediate_size=32,
                     num_hidden_layers=1, num_attention_heads=4,
                     max_position_embeddings=16, rotary_pct=0.5)
    m = NeoX(cfg)
    mesh = make_mesh(dp=2, tp=4)
    shard_module(m, mesh, NEOX_TP_RULES)

    rng = np.random.default_rng(3)
    ids_np = rng.integers(0, 48, (4, 8)).astype(np.int32)
    x = TpuTensor.from_numpy(ids_np, requires_grad=False)
    y = TpuTensor.from_numpy(np.roll(ids_np, -1, 1).reshape(-1),
                             requires_grad=False)
    opt = light.optim.Adam(m.parameters(), lr=5e-3)

    def step():
        loss = light.loss.cross_entropy(m(x).reshape(-1, 48), y)
        opt.zero_grad()
        loss.backward()
        opt.step()
        return loss

    fn = light.jit(step)
    first = fn().item()
    for _ in range(7):
        last = fn().item()
    assert np.isfinite(last) and last < first
