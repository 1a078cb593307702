"""T5 parity vs HuggingFace transformers (CPU torch, no network).

Same protocol as tests/test_{bert,vit}.py: random-init a small HF
T5ForConditionalGeneration, serialize with torch.save, load through our
dependency-light reader + remap_hf_state, compare logits end to end
(relative position buckets, RMS layer norm, cross-attention, tied-head
rescale, causal decoder masking).
"""

import io

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import lightgrad_tpu as light
from lightgrad_tpu.autograd import TpuTensor
from lightgrad_tpu.models import T5Config, T5ForConditionalGeneration


def _small_hf_model(feed_forward_proj="relu"):
    cfg = transformers.T5Config(
        vocab_size=96,
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=2,
        num_decoder_layers=2,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
        dropout_rate=0.0,
        feed_forward_proj=feed_forward_proj,
        tie_word_embeddings=True,
        decoder_start_token_id=0,
    )
    torch.manual_seed(0)
    return transformers.T5ForConditionalGeneration(cfg).eval(), cfg


def _ours_from_hf(hf_model, hf_cfg):
    from lightgrad_tpu.utils import load_torch_state_dict

    buf = io.BytesIO()
    torch.save(hf_model.state_dict(), buf)
    state = load_torch_state_dict(buf.getvalue())

    cfg = T5Config(
        vocab_size=hf_cfg.vocab_size,
        d_model=hf_cfg.d_model,
        d_kv=hf_cfg.d_kv,
        d_ff=hf_cfg.d_ff,
        num_layers=hf_cfg.num_layers,
        num_decoder_layers=hf_cfg.num_decoder_layers,
        num_heads=hf_cfg.num_heads,
        relative_attention_num_buckets=hf_cfg.relative_attention_num_buckets,
        relative_attention_max_distance=hf_cfg.relative_attention_max_distance,
        dropout_rate=0.0,
        feed_forward_proj=hf_cfg.feed_forward_proj,
        tie_word_embeddings=True,
    )
    model = T5ForConditionalGeneration(cfg)
    model.load_parameters(T5ForConditionalGeneration.remap_hf_state(state))
    model.eval()
    return model, cfg


def _ids(rng, b, s, vocab=96):
    return rng.integers(2, vocab, (b, s)).astype(np.int32)


def test_t5_matches_transformers():
    hf_model, hf_cfg = _small_hf_model()
    model, cfg = _ours_from_hf(hf_model, hf_cfg)

    rng = np.random.default_rng(3)
    src = _ids(rng, 2, 9)
    tgt = _ids(rng, 2, 6)

    with torch.no_grad():
        ref = hf_model(input_ids=torch.tensor(src.astype(np.int64)),
                       decoder_input_ids=torch.tensor(tgt.astype(np.int64))
                       ).logits.numpy()

    ours = model(TpuTensor.from_numpy(src, requires_grad=False),
                 TpuTensor.from_numpy(tgt, requires_grad=False)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)
    assert (ours.argmax(-1) == ref.argmax(-1)).all()


def test_t5_matches_transformers_with_padding_mask():
    """Encoder padding masked out via attention_mask (both attn sites)."""
    hf_model, hf_cfg = _small_hf_model()
    model, cfg = _ours_from_hf(hf_model, hf_cfg)

    rng = np.random.default_rng(4)
    src = _ids(rng, 2, 8)
    src[:, 6:] = 0                                   # padded tail
    am = (src != 0).astype(np.int32)
    tgt = _ids(rng, 2, 5)

    with torch.no_grad():
        ref = hf_model(input_ids=torch.tensor(src.astype(np.int64)),
                       attention_mask=torch.tensor(am.astype(np.int64)),
                       decoder_input_ids=torch.tensor(tgt.astype(np.int64))
                       ).logits.numpy()

    ours = model(TpuTensor.from_numpy(src, requires_grad=False),
                 TpuTensor.from_numpy(tgt, requires_grad=False),
                 attention_mask=TpuTensor.from_numpy(am, requires_grad=False)
                 ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_t5_gated_act_matches_transformers():
    """v1.1-style gated-gelu FFN (wi_0 gate * wi_1)."""
    hf_model, hf_cfg = _small_hf_model(feed_forward_proj="gated-gelu")
    model, cfg = _ours_from_hf(hf_model, hf_cfg)

    rng = np.random.default_rng(5)
    src, tgt = _ids(rng, 1, 7), _ids(rng, 1, 4)
    with torch.no_grad():
        ref = hf_model(input_ids=torch.tensor(src.astype(np.int64)),
                       decoder_input_ids=torch.tensor(tgt.astype(np.int64))
                       ).logits.numpy()
    ours = model(TpuTensor.from_numpy(src, requires_grad=False),
                 TpuTensor.from_numpy(tgt, requires_grad=False)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=3e-3, atol=3e-3)


def test_t5_trains():
    """Tiny T5 learns a copy task (encoder input -> same tokens)."""
    np.random.seed(0)
    cfg = T5Config(vocab_size=32, d_model=24, d_kv=6, d_ff=48, num_layers=1,
                   num_decoder_layers=1, num_heads=4,
                   relative_attention_num_buckets=8,
                   relative_attention_max_distance=10, dropout_rate=0.0)
    model = T5ForConditionalGeneration(cfg)

    rng = np.random.default_rng(1)
    src = rng.integers(2, 32, (8, 6)).astype(np.int32)
    labels = src.copy()
    dec_in = model.shift_right(labels)

    x = TpuTensor.from_numpy(src, requires_grad=False)
    d = TpuTensor.from_numpy(dec_in, requires_grad=False)
    y = TpuTensor.from_numpy(labels.reshape(-1), requires_grad=False)
    opt = light.optim.Adam(model.parameters(), lr=1e-2)

    losses = []
    for _ in range(40):
        logits = model(x, d).reshape(-1, 32)
        loss = light.loss.cross_entropy(logits, y)
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(loss.item())
    assert losses[-1] < losses[0] * 0.6, losses[::8]


def test_t5_generate_greedy_matches_hf():
    hf_model, hf_cfg = _small_hf_model()
    model, cfg = _ours_from_hf(hf_model, hf_cfg)

    rng = np.random.default_rng(6)
    src = _ids(rng, 2, 7)
    with torch.no_grad():
        ref = hf_model.generate(torch.tensor(src.astype(np.int64)),
                                max_new_tokens=6, do_sample=False,
                                num_beams=1).numpy()
    ours = model.generate(TpuTensor.from_numpy(src, requires_grad=False),
                          max_new_tokens=6)
    # HF output includes the start token; ours starts after it.  Compare the
    # generated continuation up to our (possibly eos-shortened) length.
    n = ours.shape[1]
    np.testing.assert_array_equal(ours, ref[:, 1:1 + n])


def test_t5_hf_export_roundtrip():
    """export_hf_state loads back into a fresh HF model with equal logits."""
    hf_model, hf_cfg = _small_hf_model()
    model, cfg = _ours_from_hf(hf_model, hf_cfg)

    exported = {k: torch.tensor(np.asarray(v))
                for k, v in model.export_hf_state().items()}
    torch.manual_seed(7)
    hf2 = transformers.T5ForConditionalGeneration(hf_cfg).eval()
    missing, unexpected = hf2.load_state_dict(exported, strict=False)
    assert not unexpected, unexpected

    rng = np.random.default_rng(8)
    src, tgt = _ids(rng, 1, 5), _ids(rng, 1, 3)
    with torch.no_grad():
        a = hf_model(input_ids=torch.tensor(src.astype(np.int64)),
                     decoder_input_ids=torch.tensor(tgt.astype(np.int64))
                     ).logits.numpy()
        b = hf2(input_ids=torch.tensor(src.astype(np.int64)),
                decoder_input_ids=torch.tensor(tgt.astype(np.int64))
                ).logits.numpy()
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_t5_tensor_parallel_train_step():
    """dp x tp sharded T5 train step executes and reduces the loss."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device mesh")
    from lightgrad_tpu.parallel import make_mesh, shard_module, T5_TP_RULES
    from jax.sharding import PartitionSpec as P
    from lightgrad_tpu.parallel import partition_rules

    assert partition_rules(
        T5_TP_RULES,
        "encoder.block.0.layer.0.SelfAttention.q.weight") == P("tp", None)
    assert partition_rules(
        T5_TP_RULES,
        "decoder.block.0.layer.1.EncDecAttention.o.weight") == P(None, "tp")
    assert partition_rules(
        T5_TP_RULES, "encoder.block.0.layer.1.DenseReluDense.wo.weight"
    ) == P(None, "tp")
    assert partition_rules(T5_TP_RULES, "shared.weight") == P("tp", None)
    assert partition_rules(
        T5_TP_RULES, "encoder.block.0.layer.0.layer_norm.weight") == P()

    np.random.seed(2)
    cfg = T5Config(vocab_size=32, d_model=16, d_kv=4, d_ff=32, num_layers=1,
                   num_decoder_layers=1, num_heads=4,
                   relative_attention_num_buckets=8,
                   relative_attention_max_distance=10, dropout_rate=0.0)
    model = T5ForConditionalGeneration(cfg)
    mesh = make_mesh(dp=2, tp=4)
    shard_module(model, mesh, T5_TP_RULES)

    rng = np.random.default_rng(9)
    src = rng.integers(2, 32, (4, 6)).astype(np.int32)
    labels = src.copy()
    x = TpuTensor.from_numpy(src, requires_grad=False)
    d = TpuTensor.from_numpy(model.shift_right(labels), requires_grad=False)
    y = TpuTensor.from_numpy(labels.reshape(-1), requires_grad=False)
    opt = light.optim.Adam(model.parameters(), lr=5e-3)

    def step():
        loss = light.loss.cross_entropy(model(x, d).reshape(-1, 32), y)
        opt.zero_grad()
        loss.backward()
        opt.step()
        return loss

    fn = light.jit(step)
    first = fn().item()
    for _ in range(9):
        last = fn().item()
    assert np.isfinite(last) and last < first


def test_t5_kv_cache_decode_matches_full_rerun():
    """use_cache=True (incremental KV decode) equals the full-rerun oracle,
    greedy and sampled (same rng seed)."""
    hf_model, hf_cfg = _small_hf_model()
    model, cfg = _ours_from_hf(hf_model, hf_cfg)

    rng = np.random.default_rng(11)
    src = _ids(rng, 3, 9)
    x = TpuTensor.from_numpy(src, requires_grad=False)
    am = np.ones_like(src)
    am[:, 7:] = 0
    amt = TpuTensor.from_numpy(am.astype(np.int32), requires_grad=False)

    fast = model.generate(x, max_new_tokens=7, use_cache=True)
    slow = model.generate(x, max_new_tokens=7, use_cache=False)
    np.testing.assert_array_equal(fast, slow)

    fast_m = model.generate(x, max_new_tokens=5, attention_mask=amt,
                            use_cache=True)
    slow_m = model.generate(x, max_new_tokens=5, attention_mask=amt,
                            use_cache=False)
    np.testing.assert_array_equal(fast_m, slow_m)

    s1 = model.generate(x, max_new_tokens=5, temperature=0.8,
                        rng=np.random.default_rng(0), use_cache=True)
    s2 = model.generate(x, max_new_tokens=5, temperature=0.8,
                        rng=np.random.default_rng(0), use_cache=False)
    np.testing.assert_array_equal(s1, s2)


def test_t5_beam_search():
    """beam_size=1 equals greedy; beam_size=4 matches HF beam search."""
    hf_model, hf_cfg = _small_hf_model()
    model, cfg = _ours_from_hf(hf_model, hf_cfg)

    rng = np.random.default_rng(12)
    src = _ids(rng, 1, 8)
    x = TpuTensor.from_numpy(src, requires_grad=False)

    greedy = model.generate(x, max_new_tokens=6)
    b1 = model.beam_generate(x, max_new_tokens=6, beam_size=1)
    np.testing.assert_array_equal(b1, greedy[0, :len(b1)])

    with torch.no_grad():
        ref = hf_model.generate(torch.tensor(src.astype(np.int64)),
                                max_new_tokens=6, num_beams=4,
                                do_sample=False, length_penalty=1.0,
                                early_stopping=True).numpy()[0]
    b4 = model.beam_generate(x, max_new_tokens=6, beam_size=4)
    np.testing.assert_array_equal(b4, ref[1:1 + len(b4)])


def test_t5_compiled_decode_matches_eager():
    """generate_compiled (fixed-shape jax KV path) equals the eager
    tape-level generate, greedy, with and without a padding mask."""
    hf_model, hf_cfg = _small_hf_model()
    model, cfg = _ours_from_hf(hf_model, hf_cfg)

    rng = np.random.default_rng(13)
    src = _ids(rng, 1, 8)
    x = TpuTensor.from_numpy(src, requires_grad=False)

    eager = model.generate(x, max_new_tokens=6)[0]
    fast = model.generate_compiled(src[0], max_new_tokens=6)
    np.testing.assert_array_equal(fast, eager[:len(fast)])

    am = np.ones((1, 8), np.int32)
    am[:, 6:] = 0
    amt = TpuTensor.from_numpy(am, requires_grad=False)
    eager_m = model.generate(x, max_new_tokens=5, attention_mask=amt)[0]
    fast_m = model.generate_compiled(src[0], max_new_tokens=5,
                                     attention_mask=am[0])
    np.testing.assert_array_equal(fast_m, eager_m[:len(fast_m)])


def test_t5_bf16_purity():
    """A bf16-cast T5 keeps its whole residual stream bf16 (the relative
    position bias and masks must cast to the score dtype, not upcast the
    model -- the same hazard the GPT causal mask had, models/bert.py:91)."""
    import jax.numpy as jnp
    from lightgrad_tpu import amp

    np.random.seed(7)
    cfg = T5Config(vocab_size=48, d_model=16, d_kv=4, d_ff=32, num_layers=2,
                   num_decoder_layers=2, num_heads=4,
                   relative_attention_num_buckets=8,
                   relative_attention_max_distance=10, dropout_rate=0.0)
    model = T5ForConditionalGeneration(cfg)
    amp.cast_module(model, jnp.bfloat16)

    rng = np.random.default_rng(7)
    src = rng.integers(2, 48, (2, 6)).astype(np.int32)
    tgt = rng.integers(2, 48, (2, 4)).astype(np.int32)
    am = np.ones_like(src); am[:, 5:] = 0
    logits = model(TpuTensor.from_numpy(src, requires_grad=False),
                   TpuTensor.from_numpy(tgt, requires_grad=False),
                   attention_mask=TpuTensor.from_numpy(
                       am.astype(np.int32), requires_grad=False))
    assert logits.dtype == jnp.bfloat16, logits.dtype
    assert np.isfinite(logits.numpy().astype(np.float32)).all()
