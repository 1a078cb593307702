"""BERT parity vs HuggingFace transformers (CPU torch, no network).

Builds a small random-init HF BertForMaskedLM, serializes its state dict with
torch.save, loads it through our dependency-light checkpoint reader + name
remapping, and compares logits.  This exercises, end to end: the torch zip
reader, parameter remapping/loading, Embedding gather, attention, LayerNorm,
GELU, and the full forward graph numerics.
"""

import io

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from lightgrad_tpu.autograd import TpuTensor
from lightgrad_tpu.models import BertConfig, BertForMaskedLM, BertTokenizer


def _small_hf_model():
    cfg = transformers.BertConfig(
        vocab_size=120,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=32,
        hidden_act="gelu_new",  # tanh-approximated gelu, matching ours
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    return transformers.BertForMaskedLM(cfg).eval(), cfg


def test_bert_matches_transformers():
    hf_model, hf_cfg = _small_hf_model()

    buf = io.BytesIO()
    torch.save(hf_model.state_dict(), buf)

    from lightgrad_tpu.utils import load_torch_state_dict

    state = load_torch_state_dict(buf.getvalue())

    cfg = BertConfig(
        vocab_size=hf_cfg.vocab_size,
        hidden_size=hf_cfg.hidden_size,
        num_hidden_layers=hf_cfg.num_hidden_layers,
        num_attention_heads=hf_cfg.num_attention_heads,
        intermediate_size=hf_cfg.intermediate_size,
        max_position_embeddings=hf_cfg.max_position_embeddings,
        layer_norm_eps=hf_cfg.layer_norm_eps,
    )
    model = BertForMaskedLM(cfg)
    model.load_parameters(BertForMaskedLM.remap_hf_state(state))

    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.vocab_size, (2, 16)).astype(np.int32)
    mask = np.ones((2, 16), dtype=np.float32)
    mask[1, 10:] = 0.0

    with torch.no_grad():
        want = hf_model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask),
        ).logits.numpy()

    got = model(
        TpuTensor.from_numpy(ids, requires_grad=False),
        attention_mask=TpuTensor.from_numpy(mask, requires_grad=False),
    ).numpy()

    # padded positions attend differently across impls; compare valid tokens
    np.testing.assert_allclose(got[0], want[0], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(got[1, :10], want[1, :10], rtol=2e-3, atol=2e-3)


def test_tokenizer_wordpiece():
    vocab = BertTokenizer.SPECIALS + ["the", "cat", "##s", "sat", "un", "##happy", "."]
    tok = BertTokenizer(vocab)
    assert tok.tokenize("The cats sat.") == ["the", "cat", "##s", "sat", "."]
    assert tok.tokenize("unhappy cats") == ["un", "##happy", "cat", "##s"]
    assert tok.tokenize("the dog") == ["the", "[UNK]"]
    assert tok.tokenize("the [MASK] sat") == ["the", "[MASK]", "sat"]
    ids = tok.encode("the cats")
    assert tok.convert_ids_to_tokens(ids) == ["[CLS]", "the", "cat", "##s", "[SEP]"]


def test_bert_backward_runs():
    """Full masked-LM training step on the small config."""
    import lightgrad_tpu as light

    np.random.seed(0)
    cfg = BertConfig(vocab_size=50, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=16)
    model = BertForMaskedLM(cfg)
    optim = light.optim.Adam(model.parameters(), lr=1e-3)
    ids = np.random.randint(0, 50, (2, 8)).astype(np.int32)
    x = TpuTensor.from_numpy(ids, requires_grad=False)
    labels = TpuTensor.from_numpy(ids.reshape(-1), requires_grad=False)

    losses = []
    for _ in range(3):
        logits = model(x).reshape(2 * 8, 50)
        loss = light.loss.cross_entropy(logits, labels)
        optim.zero_grad()
        loss.backward()
        optim.step()
        losses.append(loss.item())
    assert losses[-1] < losses[0]


def test_output_attentions_escape_hatch():
    """output_attentions=True returns (context, probs) like the reference's
    BertSelfAttention (reference bert.py:88) and matches the fused path."""
    import lightgrad_tpu as light
    from lightgrad_tpu.models.bert import BertConfig, BertSelfAttention
    from lightgrad_tpu.autograd import TpuTensor

    np.random.seed(3)
    cfg = BertConfig(hidden_size=32, num_attention_heads=4)
    attn = BertSelfAttention(cfg)
    x = TpuTensor.from_numpy(
        np.random.uniform(-1, 1, (2, 8, 32)).astype(np.float32),
        requires_grad=False)
    with light.no_grad():
        fused = attn(x).numpy()
        ctx, probs = attn(x, output_attentions=True)
    np.testing.assert_allclose(ctx.numpy(), fused, rtol=2e-5, atol=2e-5)
    p = probs.numpy()
    assert p.shape == (2, 4, 8, 8)
    np.testing.assert_allclose(p.sum(-1), np.ones((2, 4, 8)), rtol=1e-5)


def test_bert_attention_lengths_matches_mask():
    """attention_lengths (in-kernel padding) == attention_mask (additive)
    at every VALID position; padded positions are meaningless in both."""
    from lightgrad_tpu.models import BertConfig, BertForMaskedLM
    from lightgrad_tpu.autograd import TpuTensor

    np.random.seed(0)
    cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=16)
    model = BertForMaskedLM(cfg)

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 64, (3, 12)).astype(np.int32)
    lens = np.asarray([12, 7, 3], np.int32)
    am = (np.arange(12)[None, :] < lens[:, None]).astype(np.int32)

    x = TpuTensor.from_numpy(ids, requires_grad=False)
    with_mask = model(x, attention_mask=TpuTensor.from_numpy(
        am, requires_grad=False)).numpy()
    with_lens = model(x, attention_lengths=TpuTensor.from_numpy(
        lens, requires_grad=False)).numpy()
    for i, L in enumerate(lens):
        np.testing.assert_allclose(with_lens[i, :L], with_mask[i, :L],
                                   rtol=2e-4, atol=2e-4)
