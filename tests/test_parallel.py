"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device mesh"
)


@needs_mesh
def test_partition_rules():
    from lightgrad_tpu.parallel import partition_rules, BERT_TP_RULES
    from jax.sharding import PartitionSpec as P

    assert partition_rules(BERT_TP_RULES, "bert.layer.0.attention.self.query.weight") == P("tp", None)
    assert partition_rules(BERT_TP_RULES, "bert.layer.3.attention.dense.weight") == P(None, "tp")
    assert partition_rules(BERT_TP_RULES, "bert.layer.1.LayerNorm.weight") == P()
    assert partition_rules(BERT_TP_RULES, "decoder.weight") == P("tp", None)


@needs_mesh
def test_shard_module_places_params():
    from lightgrad_tpu import models, parallel

    cfg = models.BertConfig(vocab_size=128, hidden_size=32, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=64,
                            max_position_embeddings=16)
    np.random.seed(0)
    model = models.BertForMaskedLM(cfg)
    mesh = parallel.make_mesh(dp=2, tp=2)
    parallel.shard_module(model, mesh, parallel.BERT_TP_RULES)
    q = dict(model.named_parameters())["bert.layer.0.attention.self.query.weight"]
    # row-sharded over tp: each device holds half the output features
    shard_shapes = {s.data.shape for s in q.data.addressable_shards}
    assert shard_shapes == {(16, 32)}


@needs_mesh
def test_dryrun_multichip():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


@needs_mesh
def test_pipeline_parallel_matches_sequential():
    """GPipe schedule over pp=4 == sequential stage application, fwd and grad."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from lightgrad_tpu.parallel import make_mesh, pipeline_apply

    P_STAGES, N_MICRO, MB, DIM = 4, 6, 8, 16
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.5, (P_STAGES, DIM, DIM)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (P_STAGES, DIM)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(N_MICRO, MB, DIM)).astype(np.float32))

    def stage(params, h):
        wi, bi = params
        return jnp.tanh(h @ wi + bi)

    mesh = make_mesh(dp=1, tp=1, pp=P_STAGES)
    w_sh = jax.device_put(w, NamedSharding(mesh, P("pp", None, None)))
    b_sh = jax.device_put(b, NamedSharding(mesh, P("pp", None)))

    got = pipeline_apply(stage, (w_sh, b_sh), x, mesh, axis="pp")

    def sequential(params, xs):
        h = xs
        for i in range(P_STAGES):
            h = stage((params[0][i], params[1][i]), h)
        return h

    want = sequential((w, b), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    # gradients flow through the pipeline collectives
    def pipe_loss(params):
        y = pipeline_apply(stage, params, x, mesh, axis="pp")
        return jnp.sum(y * y)

    def seq_loss(params):
        return jnp.sum(sequential(params, x) ** 2)

    gp = jax.grad(pipe_loss)((w_sh, b_sh))
    gs = jax.grad(seq_loss)((w, b))
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gs[0]), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gs[1]), rtol=2e-4, atol=2e-4)


@needs_mesh
def test_moe_expert_parallel():
    """MoE layer trains with expert weights sharded over an ep axis."""
    import lightgrad_tpu as light
    import lightgrad_tpu.nn as nn
    from lightgrad_tpu.parallel import make_mesh, shard_module, MOE_EP_RULES
    from lightgrad_tpu.autograd import TpuTensor

    np.random.seed(0)
    moe = nn.MoE(dim=16, hidden=32, n_experts=4)
    mesh = make_mesh(dp=1, tp=1, ep=4)
    shard_module(moe, mesh, MOE_EP_RULES)
    w1 = dict(moe.named_parameters())["w1"]
    assert {s.data.shape for s in w1.data.addressable_shards} == {(1, 16, 32)}

    x = TpuTensor.from_numpy(np.random.uniform(-1, 1, (8, 16)).astype(np.float32), requires_grad=False)
    y = TpuTensor.from_numpy(np.random.uniform(-1, 1, (8, 16)).astype(np.float32), requires_grad=False)
    optim = light.optim.Adam(moe.parameters(), lr=5e-3)
    losses = []
    for _ in range(25):
        loss = light.loss.mse(moe(x), y)
        optim.zero_grad()
        loss.backward()
        optim.step()
        losses.append(loss.item())
    assert losses[-1] < losses[0], losses[::8]


def test_moe_single_chip():
    import lightgrad_tpu as light
    import lightgrad_tpu.nn as nn
    from lightgrad_tpu.autograd import TpuTensor
    from lightgrad_tpu.utils.gradcheck import assert_gradcheck

    np.random.seed(1)
    moe = nn.MoE(dim=6, hidden=8, n_experts=3)
    x = TpuTensor.from_numpy(np.random.uniform(-1, 1, (4, 6)).astype(np.float32))
    assert moe(x).shape == (4, 6)
    assert_gradcheck(lambda t: moe(t), x, atol=2e-3, rtol=2e-3)


def test_moe_top1_dispatch():
    """Sparse top-1 dispatch: routed experts only, capacity respected."""
    import lightgrad_tpu as light
    import lightgrad_tpu.nn as nn
    from lightgrad_tpu.autograd import TpuTensor

    np.random.seed(2)
    moe = nn.MoE(dim=8, hidden=16, n_experts=4, dispatch="top1", capacity_factor=2.0)
    x = TpuTensor.from_numpy(np.random.uniform(-1, 1, (12, 8)).astype(np.float32), requires_grad=False)
    y = moe(x)
    assert y.shape == (12, 8)
    # reference: manual per-token routing with the same weights
    probs_np = None
    t = x.numpy()
    wr = dict(moe.named_parameters())["router.weight"].numpy()
    logits = t @ wr.T
    e = np.exp(logits - logits.max(-1, keepdims=True)); probs_np = e / e.sum(-1, keepdims=True)
    top = probs_np.argmax(-1)
    w1 = dict(moe.named_parameters())["w1"].numpy()
    w2 = dict(moe.named_parameters())["w2"].numpy()

    def gelu(v):
        return 0.5 * v * (1 + np.tanh(0.7978845608028654 * (v + 0.044715 * v**3)))

    want = np.zeros_like(t)
    counts = {i: 0 for i in range(4)}
    cap = int(np.ceil(12 / 4 * 2.0))
    for i, eidx in enumerate(top):
        if counts[eidx] >= cap:
            continue
        counts[eidx] += 1
        want[i] = probs_np[i, eidx] * (gelu(t[i] @ w1[eidx]) @ w2[eidx])
    np.testing.assert_allclose(y.numpy(), want, rtol=1e-4, atol=1e-5)

    # trains end to end
    optim = light.optim.Adam(moe.parameters(), lr=5e-3)
    tgt = TpuTensor.from_numpy(np.random.uniform(-1, 1, (12, 8)).astype(np.float32), requires_grad=False)
    losses = []
    xg = TpuTensor.from_numpy(t, requires_grad=False)
    for _ in range(30):
        loss = light.loss.mse(moe(xg), tgt)
        optim.zero_grad(); loss.backward(); optim.step()
        losses.append(loss.item())
    assert losses[-1] < losses[0]


def test_moe_load_balancing_loss():
    """Training with the aux loss spreads routing across experts."""
    import lightgrad_tpu as light
    import lightgrad_tpu.nn as nn
    from lightgrad_tpu.autograd import TpuTensor

    np.random.seed(4)
    moe = nn.MoE(dim=8, hidden=16, n_experts=4, dispatch="top1", capacity_factor=4.0)
    x = TpuTensor.from_numpy(np.random.uniform(-1, 1, (64, 8)).astype(np.float32), requires_grad=False)
    y = TpuTensor.from_numpy(np.random.uniform(-1, 1, (64, 8)).astype(np.float32), requires_grad=False)
    optim = light.optim.Adam(moe.parameters(), lr=5e-3)
    for _ in range(40):
        main = light.loss.mse(moe(x), y)
        loss = main + moe.aux_loss * 0.05
        optim.zero_grad()
        loss.backward()
        optim.step()
    # perfectly balanced aux loss is 1.0; assert routing is not collapsed
    final_aux = moe.aux_loss.item()
    assert final_aux < 2.0, final_aux
    assert np.isfinite(final_aux)


def test_moe_aux_loss_not_a_parameter():
    import lightgrad_tpu.nn as nn
    from lightgrad_tpu.autograd import TpuTensor

    moe = nn.MoE(dim=4, hidden=8, n_experts=2, dispatch="top1")
    x = TpuTensor.from_numpy(np.ones((4, 4), np.float32), requires_grad=False)
    n_before = len(list(moe.parameters()))
    moe(x)
    assert len(list(moe.parameters())) == n_before
    assert "aux_loss" not in moe.state_dict()
