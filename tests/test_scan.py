"""Scan-over-layers (lightgrad_tpu/scan.py): equivalence with the inlined
layer loop -- forward values, training trajectories, checkpoint layout, and
the jit step-compiler path.  Runs on the CPU backend (jax arrays), like the
rest of the suite; the scanned program is identical modulo the While loop.
"""

import numpy as np
import pytest

import lightgrad_tpu as light
import lightgrad_tpu.nn as nn
from lightgrad_tpu.autograd import TpuTensor
from lightgrad_tpu.models.gpt import GPT, GPTConfig


def _small_cfg(**kw):
    return GPTConfig(vocab_size=64, n_positions=16, n_embd=32, n_layer=3,
                     n_head=2, **kw)


def _mk_pair(**kw):
    """Two GPTs with identical weights: one looped, one scanned."""
    np.random.seed(0)
    ref = GPT(_small_cfg())
    scanned = GPT(_small_cfg(scan_layers=True, **kw))
    scanned.load_parameters(ref.state_dict())
    return ref, scanned


def _ids(batch=2, seq=8, seed=1):
    rng = np.random.default_rng(seed)
    return TpuTensor.from_numpy(
        rng.integers(0, 64, (batch, seq)).astype(np.int32), requires_grad=False)


def test_forward_matches_loop():
    ref, scanned = _mk_pair()
    ids = _ids()
    with light.no_grad():
        a = ref(ids).numpy()
        b = scanned(ids).numpy()
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_gradients_match_loop():
    ref, scanned = _mk_pair()
    ids = _ids()
    tgt = TpuTensor.from_numpy(
        np.random.default_rng(2).integers(0, 64, (2 * 8,)).astype(np.int32),
        requires_grad=False)

    def grads_of(model):
        logits = model(ids).reshape(2 * 8, 64)
        loss = light.loss.cross_entropy(logits, tgt)
        for p in model.parameters():
            p.zero_grad()
        loss.backward()
        return float(loss.item()), model

    la, ma = grads_of(ref)
    lb, mb = grads_of(scanned)
    np.testing.assert_allclose(la, lb, rtol=1e-5)
    # per-layer grads from the loop == unstacked grads from the scan
    ga = {n: p.grad.numpy() for n, p in ma.named_parameters() if p.grad is not None}
    stacked = mb.h._stacked
    for n, t in stacked.items():
        got = t.grad.numpy()
        for l in range(mb.h.n_layers):
            want = ga[f"h.{l}.{n}"]
            np.testing.assert_allclose(got[l], want, rtol=5e-4, atol=5e-5,
                                       err_msg=f"h.{l}.{n}")
    # embedding/final-LN grads match too
    for n in ("wte.weight", "wpe.weight", "ln_f.weight", "ln_f.bias"):
        gb = dict(mb.named_parameters())[n].grad.numpy()
        np.testing.assert_allclose(ga[n], gb, rtol=5e-4, atol=5e-5, err_msg=n)


@pytest.mark.parametrize(
    "remat",
    [False, "dots",  # "dots" saves GEMM outputs: near-zero recompute, so it
     # stays in the default run and covers the policy plumbing
     pytest.param(True, marks=pytest.mark.slow)],  # full remat re-pays the
    # whole fwd in bwd: ~22 s on the 1-core host; the False variant covers the
    # scan-vs-loop equivalence in the default run
)
def test_jit_training_matches_loop(remat):
    """Compiled (light.jit) training trajectories agree loop vs scan."""
    ref, scanned = _mk_pair(remat=remat)
    ids = _ids()
    tgt = TpuTensor.from_numpy(
        np.random.default_rng(2).integers(0, 64, (2 * 8,)).astype(np.int32),
        requires_grad=False)

    def losses_of(model):
        optim = light.optim.Adam(model.parameters(), lr=1e-3)

        def step():
            logits = model(ids).reshape(2 * 8, 64)
            loss = light.loss.cross_entropy(logits, tgt)
            optim.zero_grad()
            loss.backward()
            optim.step()
            return loss

        fn = light.jit(step)
        return [float(fn().item()) for _ in range(6)]

    la = losses_of(ref)
    lb = losses_of(scanned)
    np.testing.assert_allclose(la, lb, rtol=2e-4, atol=2e-5)
    assert lb[-1] < lb[0], lb


def test_state_dict_roundtrip_per_layer_names():
    """Scanned checkpoints use per-layer names -- identical to the loop
    layout, so HF import/export and checkpoint.py are scan-agnostic."""
    ref, scanned = _mk_pair()
    sd_ref = ref.state_dict()
    sd_scan = scanned.state_dict()
    assert set(sd_ref) == set(sd_scan)
    for k in sd_ref:
        np.testing.assert_array_equal(sd_ref[k], sd_scan[k], err_msg=k)
    # loading the loop model from the scanned dict round-trips
    np.random.seed(7)
    other = GPT(_small_cfg())
    other.load_parameters(sd_scan)
    ids = _ids()
    with light.no_grad():
        np.testing.assert_allclose(
            other(ids).numpy(), scanned(ids).numpy(), rtol=2e-5, atol=2e-5)


def test_kv_cache_decode_with_scan():
    """KV-cache generation reads per-layer views out of the stacked params."""
    ref, scanned = _mk_pair()
    out_ref = ref.generate([3, 5, 7], max_new_tokens=5, temperature=0.0)
    out_scan = scanned.generate([3, 5, 7], max_new_tokens=5, temperature=0.0)
    assert out_ref == out_scan


@pytest.mark.slow  # 30 s: AMP + scan whole-step compile on the 1-core host
def test_amp_training_with_scan():
    """Master-weight AMP over a scanned GPT (the bench GPT configuration):
    cast_module rebinds the stacked params; the _stacked view must follow
    the rebind and the compiled AMP step must train."""
    import jax.numpy as jnp

    np.random.seed(0)
    model = GPT(_small_cfg(scan_layers=True))
    mp = light.amp.MixedPrecision(model, lambda ps: light.optim.Adam(ps, lr=1e-3))
    # stacked params are now bf16 AND identical objects in _params/_stacked
    for n, t in model.h._stacked.items():
        assert t.data.dtype == jnp.bfloat16, n
        assert any(t is p for p in model.parameters()), n
    ids = _ids()
    tgt = TpuTensor.from_numpy(
        np.random.default_rng(2).integers(0, 64, (2 * 8,)).astype(np.int32),
        requires_grad=False)

    def step():
        logits = model(ids).reshape(2 * 8, 64)
        loss = light.loss.cross_entropy(logits, tgt)
        mp.zero_grad()
        loss.backward()
        mp.step()
        return loss

    fn = light.jit(step)
    losses = [float(fn().item()) for _ in range(8)]
    assert losses[-1] < losses[0], losses


def test_bert_scan_matches_loop():
    """BERT with scanned encoder layers == looped, incl. the attention-mask
    extra argument (broadcast, not scanned)."""
    from lightgrad_tpu.models.bert import BertConfig, BertForMaskedLM

    kw = dict(vocab_size=64, hidden_size=32, num_hidden_layers=3,
              num_attention_heads=2, intermediate_size=64,
              max_position_embeddings=16)
    np.random.seed(0)
    ref = BertForMaskedLM(BertConfig(**kw))
    scanned = BertForMaskedLM(BertConfig(scan_layers=True, **kw))
    scanned.load_parameters(ref.state_dict())
    rng = np.random.default_rng(3)
    ids = TpuTensor.from_numpy(rng.integers(0, 64, (2, 8)).astype(np.int32),
                               requires_grad=False)
    mask = TpuTensor.from_numpy(
        np.array([[1] * 8, [1] * 5 + [0] * 3], np.float32), requires_grad=False)
    with light.no_grad():
        a = ref(ids, attention_mask=mask).numpy()
        b = scanned(ids, attention_mask=mask).numpy()
    np.testing.assert_allclose(a, b, rtol=3e-5, atol=3e-5)


def test_llama_scan_matches_loop():
    from lightgrad_tpu.models.llama import LlamaConfig, Llama

    kw = dict(vocab_size=64, hidden_size=32, intermediate_size=48,
              num_hidden_layers=3, num_attention_heads=2,
              num_key_value_heads=1, max_position_embeddings=16)
    np.random.seed(0)
    ref = Llama(LlamaConfig(**kw))
    scanned = Llama(LlamaConfig(scan_layers=True, **kw))
    scanned.load_parameters(ref.state_dict())
    rng = np.random.default_rng(4)
    ids = TpuTensor.from_numpy(rng.integers(0, 64, (2, 8)).astype(np.int32),
                               requires_grad=False)
    with light.no_grad():
        np.testing.assert_allclose(ref(ids).numpy(), scanned(ids).numpy(),
                                   rtol=3e-5, atol=3e-5)


def test_live_dropout_rejected():
    """A training-mode Dropout inside a scanned block must raise (one traced
    mask would silently repeat across layers)."""

    class Blk(nn.Module):
        def __init__(self):
            super().__init__()
            self.lin = nn.Linear(8, 8)
            self.drop = nn.Dropout(0.5)

        def forward(self, x):
            return self.drop(self.lin(x))

    from lightgrad_tpu.scan import ScannedStack

    np.random.seed(0)
    stack = ScannedStack([Blk(), Blk()])
    x = TpuTensor.from_numpy(np.ones((2, 8), np.float32), requires_grad=False)
    with pytest.raises(AssertionError, match="Dropout"):
        stack(x)
    stack.eval()
    y = stack(x)  # eval mode: fine
    assert y.shape == (2, 8)
