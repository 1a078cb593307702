"""LoRA fine-tuning: identity at init, adapter-only grads, exact merge."""

import numpy as np

from lightgrad_tpu import lora, nn
from lightgrad_tpu.autograd import TpuTensor
from lightgrad_tpu.loss import cross_entropy
from lightgrad_tpu.models import GPT, GPTConfig
from lightgrad_tpu.optim import Adam


def _tiny_gpt():
    cfg = GPTConfig(vocab_size=50, n_embd=32, n_layer=2, n_head=4,
                    n_positions=16)
    return GPT(cfg)


def _batch(rng, vocab=50, b=4, s=12):
    return rng.integers(0, vocab, (b, s)).astype(np.int32)


def test_lora_identity_at_init():
    model = _tiny_gpt()
    rng = np.random.default_rng(0)
    ids = _batch(rng)
    x = TpuTensor.from_numpy(ids, requires_grad=False)
    before = model(x).numpy()
    wrapped = lora.apply_lora(model, rank=4, targets=("c_attn", "c_proj",
                                                      "c_fc"))
    assert len(wrapped) >= 4
    after = model(x).numpy()
    np.testing.assert_allclose(after, before, atol=1e-6, rtol=1e-6)


def test_lora_trains_only_adapters():
    model = _tiny_gpt()
    lora.apply_lora(model, rank=4, targets=("c_attn",))
    params = lora.lora_parameters(model)
    assert params and all(p.requires_grad for p in params)
    frozen = {n: p.numpy().copy() for n, p in model.named_parameters()
              if n.rsplit(".", 1)[-1] not in ("lora_A", "lora_B")}
    assert frozen, "expected frozen base parameters"

    rng = np.random.default_rng(1)
    ids = _batch(rng)
    x = TpuTensor.from_numpy(ids, requires_grad=False)
    tgt = TpuTensor.from_numpy(ids.reshape(-1), requires_grad=False)
    opt = Adam(params, lr=5e-3)
    losses = []
    for _ in range(8):
        loss = cross_entropy(model(x).reshape(-1, 50), tgt)
        loss.backward()
        opt.step()
        opt.zero_grad()
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0], losses
    for n, p in model.named_parameters():
        leaf = n.rsplit(".", 1)[-1]
        if leaf in ("lora_A", "lora_B"):
            continue
        np.testing.assert_array_equal(p.numpy(), frozen[n]), n
    # B must have moved away from zero
    bs = [p for n, p in model.named_parameters() if n.endswith("lora_B")]
    assert any(np.abs(b.numpy()).max() > 0 for b in bs)


def test_lora_merge_is_exact():
    model = _tiny_gpt()
    lora.apply_lora(model, rank=4, alpha=8, targets=("c_attn", "c_fc"))
    # make the adapters non-trivial
    for n, p in model.named_parameters():
        if n.endswith("lora_B"):
            p._set_data(type(p).from_numpy(
                np.random.default_rng(2).standard_normal(p.shape)
                .astype(np.float32) * 0.02).data)
    rng = np.random.default_rng(3)
    ids = _batch(rng)
    x = TpuTensor.from_numpy(ids, requires_grad=False)
    adapted = model(x).numpy()

    merged = lora.merge_lora(model)
    assert merged
    plain = model(x).numpy()
    np.testing.assert_allclose(plain, adapted, atol=2e-5, rtol=2e-5)
    # names restored: no lora_/base. leftovers, everything trainable again
    names = [n for n, _ in model.named_parameters()]
    assert not any(".base." in n or "lora_" in n for n in names)
    assert all(p.requires_grad for _, p in model.named_parameters())


def test_lora_compiled_step():
    """The step compiler records a LoRA step: adapters train, base frozen."""
    from lightgrad_tpu.jit import jit

    model = _tiny_gpt()
    lora.apply_lora(model, rank=4, targets=("c_attn",))
    params = lora.lora_parameters(model)
    opt = Adam(params, lr=5e-3)
    base_before = {n: p.numpy().copy() for n, p in model.named_parameters()
                   if "lora_" not in n}

    @jit
    def step(x, tgt):
        loss = cross_entropy(model(x).reshape(-1, 50), tgt)
        loss.backward()
        opt.step()
        opt.zero_grad()
        return loss

    rng = np.random.default_rng(4)
    ids = _batch(rng)
    x = TpuTensor.from_numpy(ids, requires_grad=False)
    tgt = TpuTensor.from_numpy(ids.reshape(-1), requires_grad=False)
    losses = [float(step(x, tgt).item()) for _ in range(6)]
    assert losses[-1] < losses[0], losses
    for n, p in model.named_parameters():
        if "lora_" not in n:
            np.testing.assert_array_equal(p.numpy(), base_before[n])


def test_lora_state_dict_roundtrip():
    m1 = _tiny_gpt()
    state = m1.state_dict()
    lora.apply_lora(m1, rank=4, targets=("c_attn",))
    for n, p in m1.named_parameters():
        if n.endswith("lora_B"):
            p._set_data(type(p).from_numpy(
                np.random.default_rng(5).standard_normal(p.shape)
                .astype(np.float32) * 0.05).data)
    adapters = lora.lora_state_dict(m1)
    assert adapters and all("lora_" in k for k in adapters)

    m2 = _tiny_gpt()
    m2.load_parameters(state)
    lora.apply_lora(m2, rank=4, targets=("c_attn",))
    full = m2.state_dict()
    full.update(adapters)
    m2.load_parameters(full)

    rng = np.random.default_rng(6)
    ids = _batch(rng)
    x = TpuTensor.from_numpy(ids, requires_grad=False)
    np.testing.assert_allclose(m2(x).numpy(), m1(x).numpy(),
                               atol=1e-6, rtol=1e-6)
