"""GPT-MoE model family: sparse-FFN blocks inside the GPT stack.

Framework extension (no reference counterpart): GPTConfig(n_experts>0)
replaces the dense FFN of every ``moe_every``-th block with an nn.MoE
(Switch/Mixtral-style top-k routing), the model sums the router
load-balancing losses into ``model.aux_loss``, and the stacked expert
weights shard over an ``ep`` mesh axis via parallel.GPT_MOE_RULES.
"""

import numpy as np
import pytest

import jax

import lightgrad_tpu as light
import lightgrad_tpu.nn as nn
from lightgrad_tpu.autograd import TpuTensor
from lightgrad_tpu.models import GPT, GPTConfig

needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device mesh"
)


def tiny_cfg(**kw):
    base = dict(vocab_size=64, n_positions=16, n_embd=16, n_layer=2,
                n_head=2, n_experts=4, moe_k=2, moe_hidden=32)
    base.update(kw)
    return GPTConfig(**base)


def ids(b, s, vocab=64, seed=0):
    rng = np.random.default_rng(seed)
    return TpuTensor.from_numpy(
        rng.integers(0, vocab, (b, s)).astype(np.int32), requires_grad=False)


def test_moe_block_structure():
    """moe_every picks which blocks are sparse; params are registered."""
    m = GPT(tiny_cfg(n_layer=4, moe_every=2))
    names = dict(m.named_parameters())
    # blocks 1 and 3 are MoE (every 2nd), 0 and 2 dense
    assert "h.1.moe.w1" in names and "h.3.moe.w2" in names
    assert "h.0.c_fc.weight" in names and "h.2.c_proj.weight" in names
    assert "h.1.c_fc.weight" not in names
    assert names["h.1.moe.w1"].shape == (4, 16, 32)
    # aux_loss is per-forward state, never saved
    assert not any("aux_loss" in k for k in m.state_dict())


def test_moe_forward_and_aux_loss():
    np.random.seed(1)
    m = GPT(tiny_cfg())
    logits = m(ids(2, 8))
    assert logits.shape == (2, 8, 64)
    assert np.isfinite(logits.numpy()).all()
    # both blocks are MoE (moe_every=1): aux_loss is their summed scalar
    assert m.aux_loss is not None and m.aux_loss.shape == ()
    # perfectly balanced top-1 routing gives E * sum_e (1/E * 1/E) = 1 per
    # block; real routing is >= that only in expectation -- just check range
    assert 0.0 < m.aux_loss.item() < 4 * m.cfg.n_experts


def test_dense_gpt_has_no_aux_loss():
    np.random.seed(2)
    m = GPT(GPTConfig(vocab_size=64, n_positions=16, n_embd=16, n_layer=1,
                      n_head=2))
    m(ids(1, 4))
    assert m.aux_loss is None


def test_moe_scan_layers_rejected():
    with pytest.raises(ValueError):
        tiny_cfg(scan_layers=True)


def test_moe_gpt_trains():
    """Loss (incl. aux) decreases; expert weights receive gradients."""
    np.random.seed(3)
    m = GPT(tiny_cfg())
    x = ids(4, 8, seed=3)
    # next-token targets: shifted copy of the inputs
    tgt = np.roll(x.numpy(), -1, axis=1).reshape(-1)
    tgt_t = TpuTensor.from_numpy(tgt.astype(np.int32), requires_grad=False)
    opt = light.optim.Adam(m.parameters(), lr=1e-2)

    def step():
        logits = m(x).reshape(-1, 64)
        loss = light.loss.cross_entropy(logits, tgt_t) + m.aux_loss * 0.01
        opt.zero_grad()
        loss.backward()
        opt.step()
        return loss

    # one compiled program for the whole loop (the eager 15-step variant
    # costs ~60 s of XLA:CPU per-op compiles on the CI host)
    fn = light.jit(step)
    losses = [fn().item() for _ in range(12)]
    assert losses[-1] < losses[0], losses[::4]
    # grad flow into the expert stacks: one EAGER backward (inside the
    # compiled step the grad buffers are program-internal temporaries)
    loss = light.loss.cross_entropy(m(x).reshape(-1, 64), tgt_t) \
        + m.aux_loss * 0.01
    m.zero_grad()
    loss.backward()
    w1 = dict(m.named_parameters())["h.0.moe.w1"]
    assert w1.grad is not None and np.abs(w1.grad.numpy()).max() > 0


@needs_mesh
def test_moe_gpt_expert_parallel_rules():
    from jax.sharding import PartitionSpec as P
    from lightgrad_tpu.parallel import partition_rules, GPT_MOE_RULES

    assert partition_rules(GPT_MOE_RULES, "h.1.moe.w1") == P("ep", None, None)
    assert partition_rules(GPT_MOE_RULES, "h.1.moe.router.weight") == P()
    assert partition_rules(GPT_MOE_RULES, "h.0.c_fc.weight") == P("tp", None)
    assert partition_rules(GPT_MOE_RULES, "h.0.attn.c_proj.weight") == P(None, "tp")
    assert partition_rules(GPT_MOE_RULES, "wte.weight") == P("tp", None)


@needs_mesh
def test_moe_gpt_ep_sharded_train_step():
    """dp x ep sharded GPT-MoE: one jit step executes and updates params."""
    from lightgrad_tpu.parallel import make_mesh, shard_module, GPT_MOE_RULES

    np.random.seed(4)
    m = GPT(tiny_cfg())
    mesh = make_mesh(dp=2, ep=4)
    shard_module(m, mesh, GPT_MOE_RULES)
    w1 = dict(m.named_parameters())["h.0.moe.w1"]
    # (E=4, d, h) over ep=4: one expert per ep slice
    assert {s.data.shape for s in w1.data.addressable_shards} == {(1, 16, 32)}

    x = ids(4, 8, seed=4)
    tgt = np.roll(x.numpy(), -1, axis=1).reshape(-1)
    tgt_t = TpuTensor.from_numpy(tgt.astype(np.int32), requires_grad=False)
    opt = light.optim.Adam(m.parameters(), lr=1e-2)

    def step():
        logits = m(x).reshape(-1, 64)
        loss = light.loss.cross_entropy(logits, tgt_t) + m.aux_loss * 0.01
        opt.zero_grad()
        loss.backward()
        opt.step()
        return loss

    fn = light.jit(step)
    first = fn().item()
    for _ in range(9):
        last = fn().item()
    assert np.isfinite(last) and last < first
    # params kept their ep sharding through the compiled steps
    assert {s.data.shape for s in w1.data.addressable_shards} == {(1, 16, 32)}


def test_moe_shared_experts():
    """DeepSeekMoE-style shared experts: always-on dense path adds to the
    routed output, receives gradients, and stays replicated under ep."""
    import jax
    import lightgrad_tpu.nn as nn

    np.random.seed(5)
    moe = nn.MoE(dim=8, hidden=16, n_experts=4, dispatch="topk", k=2,
                 n_shared=2)
    names = dict(moe.named_parameters())
    assert names["ws1"].shape == (2, 8, 16) and names["ws2"].shape == (2, 16, 8)

    x = TpuTensor.from_numpy(
        np.random.uniform(-1, 1, (16, 8)).astype(np.float32))
    y = moe(x)
    assert y.shape == (16, 8)
    (y * y).sum().backward()
    assert np.abs(names["ws1"].grad.numpy()).max() > 0

    # with zeroed routed experts, output reduces to the shared path alone
    moe2 = nn.MoE(dim=8, hidden=16, n_experts=4, dispatch="topk", k=2,
                  n_shared=2)
    moe2.load_parameters({k: (np.zeros_like(v.numpy())
                              if k in ("w1", "w2") else v.numpy())
                          for k, v in names.items()})
    x2 = x.detach()
    shared_only = moe2(x2).numpy()
    tb = x2.numpy().reshape(1, 16, 8)
    want = (
        np.stack([0.5 * h * (1 + np.tanh(0.7978845608028654 *
                                         (h + 0.044715 * h ** 3)))
                  for h in tb @ names["ws1"].numpy()]) @ names["ws2"].numpy()
    ).sum(axis=0)
    np.testing.assert_allclose(shared_only, want, rtol=2e-4, atol=2e-5)

    if len(jax.devices()) >= 8:
        from lightgrad_tpu.parallel import make_mesh, shard_module, MOE_EP_RULES
        mesh = make_mesh(dp=2, ep=4)
        shard_module(moe, mesh, MOE_EP_RULES)
        # routed stacks shard one expert per ep slice; shared stay replicated
        assert {s.data.shape for s in names["w1"].data.addressable_shards} \
            == {(1, 8, 16)}
        assert {s.data.shape for s in names["ws1"].data.addressable_shards} \
            == {(2, 8, 16)}


def test_moe_router_z_loss():
    """z_loss = mean(logsumexp(router logits)^2); adding it to the training
    loss shrinks the router logit scale."""
    import lightgrad_tpu.nn as nn

    np.random.seed(6)
    moe = nn.MoE(dim=8, hidden=16, n_experts=4, dispatch="topk", k=2)
    x = TpuTensor.from_numpy(
        np.random.uniform(-1, 1, (32, 8)).astype(np.float32),
        requires_grad=False)
    moe(x)
    # oracle: numpy logsumexp of the same router logits
    logits = x.numpy() @ moe.router.weight.numpy().T
    lse = np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1)) \
        + logits.max(-1)
    np.testing.assert_allclose(moe.z_loss.item(), np.mean(lse ** 2),
                               rtol=1e-5)
    assert "z_loss" not in moe.state_dict()

    opt = light.optim.Adam(moe.parameters(), lr=1e-2)
    before = None
    for _ in range(20):
        moe(x)
        zl = moe.z_loss
        before = before if before is not None else zl.item()
        opt.zero_grad()
        zl.backward()
        opt.step()
    moe(x)
    assert moe.z_loss.item() < before * 0.9


def test_moe_gpt_collects_z_loss():
    np.random.seed(8)
    m = GPT(tiny_cfg())
    m(ids(2, 8, seed=8))
    assert m.z_loss is not None and m.z_loss.shape == ()
    assert m.z_loss.item() > 0
