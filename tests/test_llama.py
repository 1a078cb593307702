"""LLaMA family: RoPE/RMSNorm/SwiGLU/GQA correctness, HF parity, decoding."""

import numpy as np
import pytest

import lightgrad_tpu as light
from lightgrad_tpu.autograd import TpuTensor
from lightgrad_tpu.models.llama import Llama, LlamaConfig, RMSNorm, _rope_tables


def _small_cfg(**kw):
    base = dict(vocab_size=89, hidden_size=32, intermediate_size=64,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=32)
    base.update(kw)
    return LlamaConfig(**base)


def test_rmsnorm_matches_numpy():
    np.random.seed(0)
    x = np.random.uniform(-2, 2, (3, 8)).astype(np.float32)
    ln = RMSNorm(8, eps=1e-5)
    got = ln(TpuTensor.from_numpy(x, requires_grad=False)).numpy()
    want = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_llama_matches_hf_transformers():
    """Logits parity with the HF reference implementation (random weights)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.LlamaConfig(
        vocab_size=89, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=32, rms_norm_eps=1e-5, attn_implementation="eager")
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    state = {k: v.numpy() for k, v in hf.state_dict().items()}

    model = Llama(_small_cfg())
    model.load_parameters(Llama.remap_hf_state(state))

    ids = np.random.default_rng(1).integers(0, 89, (2, 12)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(ids.astype(np.int64))).logits.numpy()
    got = model(TpuTensor.from_numpy(ids, requires_grad=False)).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_llama_trains():
    np.random.seed(2)
    cfg = _small_cfg()
    model = Llama(cfg)
    optim = light.optim.Adam(model.parameters(), lr=3e-3)
    seq = (np.arange(17) * 5 % cfg.vocab_size).astype(np.int32)
    x = TpuTensor.from_numpy(seq[None, :-1], requires_grad=False)
    y = TpuTensor.from_numpy(seq[1:], requires_grad=False)
    losses = []
    for _ in range(25):
        logits = model(x).reshape(16, cfg.vocab_size)
        loss = light.loss.cross_entropy(logits, y)
        optim.zero_grad(); loss.backward(); optim.step()
        losses.append(loss.item())
    assert losses[-1] < losses[0] * 0.7, losses[::8]


def test_llama_kv_cache_parity():
    np.random.seed(3)
    model = Llama(_small_cfg())
    prompt = [3, 14, 15]
    a = model.generate(prompt, max_new_tokens=10, use_cache=False)
    b = model.generate(prompt, max_new_tokens=10, use_cache=True)
    assert a == b, (a, b)
    c = model.generate(prompt, max_new_tokens=8, temperature=0.9,
                       rng=np.random.default_rng(7), use_cache=False)
    d = model.generate(prompt, max_new_tokens=8, temperature=0.9,
                       rng=np.random.default_rng(7), use_cache=True)
    assert c == d, (c, d)


def test_llama_hf_export_roundtrip(tmp_path):
    from lightgrad_tpu.utils import load_torch_state_dict

    np.random.seed(4)
    m = Llama(_small_cfg())
    back = Llama.remap_hf_state(m.export_hf_state())
    ours = m.state_dict()
    assert set(back) == set(ours)
    path = m.save_pretrained(str(tmp_path / "llama"))
    m2 = Llama(_small_cfg())
    state = load_torch_state_dict(open(path, "rb").read())
    m2.load_parameters(Llama.remap_hf_state(state))
    for (n1, p1), (n2, p2) in zip(m.named_parameters(), m2.named_parameters()):
        np.testing.assert_array_equal(p1.numpy(), p2.numpy(), err_msg=n1)


def test_concat_op_grads():
    from lightgrad_tpu.autograd import CpuTensor
    from lightgrad_tpu.utils.gradcheck import assert_gradcheck

    x = np.random.default_rng(5).uniform(-1, 1, (2, 3)).astype(np.float32)
    for cls in (CpuTensor, TpuTensor):
        t = cls.from_numpy(x)
        got = t.concat(cls.from_numpy(2 * x), axis=-1).numpy()
        np.testing.assert_allclose(got, np.concatenate([x, 2 * x], -1), rtol=1e-6)
        assert_gradcheck(lambda a: a.concat(a, axis=0), cls.from_numpy(x))


def test_llama_generate_batch_matches_single():
    """Batched (vmap-lifted) compiled decode equals per-sequence decode."""
    from lightgrad_tpu.models import Llama, LlamaConfig

    np.random.seed(0)
    cfg = LlamaConfig(vocab_size=48, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      intermediate_size=64, max_position_embeddings=32)
    m = Llama(cfg)
    rng = np.random.default_rng(2)
    prompts = [[int(t) for t in rng.integers(0, 48, n)] for n in (3, 6)]
    batched = m.generate_batch(prompts, max_new_tokens=5)
    for pr, got in zip(prompts, batched):
        want = m.generate(pr, max_new_tokens=5, use_cache=True)
        assert [int(t) for t in got] == [int(t) for t in want], (got, want)


def test_llama_generate_device_matches_host_loop():
    """Whole-generation-on-device decode over the llama _kv_functions
    contract (GQA + rotary): greedy tokens equal the host KV loop's,
    single and batched."""
    from lightgrad_tpu.models import Llama, LlamaConfig

    np.random.seed(9)
    cfg = LlamaConfig(vocab_size=48, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      intermediate_size=64, max_position_embeddings=32)
    m = Llama(cfg)
    rng = np.random.default_rng(4)
    prompts = [[int(t) for t in rng.integers(0, 48, n)] for n in (3, 6)]
    for pr in prompts:
        want = m.generate(pr, max_new_tokens=5, use_cache=True)
        got = m.generate_device(pr, max_new_tokens=5)
        assert got == [int(t) for t in want], (got, want)
    batched = m.generate_batch_device(prompts, max_new_tokens=5)
    for pr, got in zip(prompts, batched):
        want = m.generate_device(pr, max_new_tokens=5)
        assert got == want


def test_llama_quantize_serving_matches_full_precision():
    """int8 weight-only llama decode (GQA + rotary + untied head): greedy
    parity with the full-precision compiled path on a trained tiny model;
    the embedding stays full-precision (gather path)."""
    from lightgrad_tpu.models import Llama, LlamaConfig
    import lightgrad_tpu as light
    from lightgrad_tpu.autograd import TpuTensor

    np.random.seed(10)
    cfg = LlamaConfig(vocab_size=48, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      intermediate_size=64, max_position_embeddings=32)
    m = Llama(cfg)
    optim = light.optim.Adam(m.parameters(), lr=3e-3)
    seq = (np.arange(31) * 7 % 48).astype(np.int32)
    x = TpuTensor.from_numpy(seq[None, :-1], requires_grad=False)
    y = TpuTensor.from_numpy(seq[1:], requires_grad=False)
    for _ in range(8):
        loss = light.loss.cross_entropy(m(x).reshape(30, 48), y)
        optim.zero_grad(); loss.backward(); optim.step()

    prompt = seq[:5].tolist()
    want = m.generate_device(prompt, max_new_tokens=6)
    m.quantize_serving()
    got = m.generate_device(prompt, max_new_tokens=6)
    assert got == want, (got, want)
    import jax.numpy as jnp
    params = m._kv_fns[1].params
    qkeys = [k for k in params if k.endswith("#q")]
    assert qkeys and all(params[k].dtype == jnp.int8 for k in qkeys)
    assert "embed_tokens.weight" in params  # gather stays full precision
