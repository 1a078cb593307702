"""Distributed training tour: dp x tp sharding, ring attention, pipelines.

Runs on ANY device count -- on a CPU host it provisions an 8-device
virtual mesh, the same environment the test suite uses, so this example
doubles as living documentation of the parallel stack:

  1. data+tensor parallel training step (shard_module + GSPMD collectives)
  2. sequence-parallel exact attention via the ppermute ring
  3. pipeline-parallel training under the 1F1B schedule
  4. expert-parallel GPT-MoE (one expert per ep slice, routed top-k)

The reference is single-process/single-device (SURVEY.md §2.3); everything
here is the TPU-native extension axis.

    python examples/distributed.py
"""

import os
import sys

if __name__ == "__main__" and os.environ.get("LIGHTGRAD_DIST_REAL") != "1":
    # provision 8 virtual CPU devices BEFORE jax initializes (set
    # LIGHTGRAD_DIST_REAL=1 to run on an actual multi-chip slice instead)
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if __name__ == "__main__" and os.environ.get("LIGHTGRAD_DIST_REAL") != "1":
    # env-var JAX_PLATFORMS is ignored by some PJRT plugins; the config
    # update before first backend touch is authoritative
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def dp_tp_training_step():
    """BERT-ish block trained dp=2 x tp=4: params column/row-split over tp,
    batch split over dp; XLA inserts the all-reduces from the shardings."""
    import lightgrad_tpu as light
    import lightgrad_tpu.nn as nn
    from jax.sharding import PartitionSpec as P
    from lightgrad_tpu.parallel import make_mesh, shard_module

    mesh = make_mesh(dp=2, tp=4)

    class Block(nn.Module):
        def __init__(self, d=64, ffn=256):
            super().__init__()
            self.up = nn.Linear(d, ffn)
            self.down = nn.Linear(ffn, d)

        def forward(self, x):
            return self.down(self.up(x).gelu())

    np.random.seed(0)
    model = Block().map_parameters(lambda p: p.tpu())
    # Megatron MLP recipe: column-split the up projection, row-split the
    # down projection -- XLA inserts ONE all-reduce at the row-split output
    # (models ship ready-made rules, e.g. parallel.BERT_TP_RULES)
    shard_module(model, mesh, rules=[
        (r"up\.weight$", P("tp", None)),
        (r"up\.bias$", P("tp")),
        (r"down\.weight$", P(None, "tp")),
    ])
    optim = light.optim.Adam(model.parameters(), lr=1e-3)

    from lightgrad_tpu.autograd import TpuTensor
    x_np = np.random.normal(size=(16, 64)).astype(np.float32)
    y_np = np.random.normal(size=(16, 64)).astype(np.float32)
    xb = TpuTensor(jax.device_put(x_np, NamedSharding(mesh, P("dp", None))),
                   requires_grad=False)
    yb = TpuTensor(jax.device_put(y_np, NamedSharding(mesh, P("dp", None))),
                   requires_grad=False)

    losses = []
    for _ in range(5):
        loss = light.loss.mse(model(xb), yb)
        optim.zero_grad()
        loss.backward()
        optim.step()
        losses.append(loss.item())
    assert losses[-1] < losses[0], losses
    print(f"[dp2 x tp4] loss {losses[0]:.4f} -> {losses[-1]:.4f}  "
          f"(params sharded: "
          f"up={model.up.weight.data.sharding.spec} "
          f"down={model.down.weight.data.sharding.spec})")


def ring_attention_demo():
    """Exact causal attention with the sequence sharded 4 ways: K/V hop the
    ring via ppermute; no device ever holds the full sequence."""
    from lightgrad_tpu.parallel import make_mesh, ring_attention_sharded

    mesh = make_mesh(dp=1, tp=1, sp=4)
    rng = np.random.default_rng(1)
    b, s, d = 2, 1024, 32
    q, k, v = (jnp.asarray(rng.normal(0, 0.5, (b, s, d)).astype(np.float32))
               for _ in range(3))
    shard = NamedSharding(mesh, P(None, "sp", None))
    qs, ks, vs = (jax.device_put(x, shard) for x in (q, k, v))
    out = ring_attention_sharded(qs, ks, vs, 1 / np.sqrt(d), mesh,
                                 axis="sp", causal=True)
    # oracle: dense softmax attention
    scores = np.einsum("bqd,bkd->bqk", q, k) / np.sqrt(d)
    mask = np.tril(np.ones((s, s), bool))
    scores = np.where(mask, scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bqk,bkd->bqd", p, v)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-4)
    print(f"[ring sp4] causal attention s={s} matches dense oracle; "
          f"per-device residency s_local={s // 4}")


def pipeline_1f1b_demo():
    """8 microbatches through a 4-stage pipeline under 1F1B: optimal tick
    count, activation stash bounded at P, gradients exact."""
    from lightgrad_tpu.parallel import make_mesh, pipeline_train_1f1b
    from lightgrad_tpu.parallel.pipeline_1f1b import (
        onef_oneb_ticks, peak_in_flight)

    pp, mb, dim, M = 4, 4, 16, 8
    mesh = make_mesh(dp=1, tp=1, pp=pp)
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(0, 0.3, (pp, dim, dim)).astype(np.float32))
    xs = jnp.asarray(rng.normal(size=(M, mb, dim)).astype(np.float32))
    ys = jnp.asarray(rng.normal(size=(M, mb, dim)).astype(np.float32))

    stage = lambda wi, h: jnp.tanh(h @ wi)
    loss_fn = lambda y, t: jnp.mean((y - t) ** 2)
    loss, grads = jax.jit(lambda w, xs, ys: pipeline_train_1f1b(
        stage, loss_fn, w, xs, ys, mesh))(w, xs, ys)

    def ref(w):
        tot = 0.0
        for m in range(M):
            h = xs[m]
            for s in range(pp):
                h = stage(w[s], h)
            tot = tot + loss_fn(h, ys[m])
        return tot / M

    want, gwant = jax.value_and_grad(ref)(w)
    np.testing.assert_allclose(np.asarray(grads), np.asarray(gwant),
                               rtol=1e-5, atol=1e-6)
    print(f"[1F1B pp4] {M} microbatches in {onef_oneb_ticks(M, pp)} ticks "
          f"(GPipe-with-autodiff stores {M} activations/device; 1F1B peak: "
          f"{peak_in_flight(M, pp)}); loss {float(loss):.4f} == "
          f"{float(want):.4f}, grads exact")


def moe_expert_parallel_demo():
    """GPT-MoE trained dp=2 x ep=4: stacked expert weights shard one expert
    per ep slice; the router's load-balancing aux loss joins the LM loss."""
    import lightgrad_tpu as light
    from lightgrad_tpu.autograd import TpuTensor
    from lightgrad_tpu.models import GPT, GPTConfig
    from lightgrad_tpu.parallel import make_mesh, shard_module, GPT_MOE_RULES

    np.random.seed(4)
    cfg = GPTConfig(vocab_size=64, n_positions=16, n_embd=32, n_layer=2,
                    n_head=2, n_experts=4, moe_k=2, moe_hidden=64)
    model = GPT(cfg)
    mesh = make_mesh(dp=2, ep=4)
    shard_module(model, mesh, GPT_MOE_RULES)

    rng = np.random.default_rng(4)
    ids = rng.integers(0, 64, (4, 12)).astype(np.int32)
    x = TpuTensor.from_numpy(ids, requires_grad=False)
    y = TpuTensor.from_numpy(np.roll(ids, -1, 1).reshape(-1),
                             requires_grad=False)
    opt = light.optim.Adam(model.parameters(), lr=5e-3)

    def step():
        loss = light.loss.cross_entropy(model(x).reshape(-1, 64), y) \
            + model.aux_loss * 0.01
        opt.zero_grad()
        loss.backward()
        opt.step()
        return loss

    fn = light.jit(step)
    losses = [fn().item() for _ in range(10)]
    w1 = dict(model.named_parameters())["h.0.moe.w1"]
    per_dev = {s.data.shape for s in w1.data.addressable_shards}
    print(f"[moe dp2 x ep4] expert stack {tuple(w1.shape)} -> {per_dev} "
          f"per device; loss {losses[0]:.3f} -> {losses[-1]:.3f}")


if __name__ == "__main__":
    assert len(jax.devices()) >= 8, "needs 8 (virtual) devices"
    dp_tp_training_step()
    ring_attention_demo()
    pipeline_1f1b_demo()
    moe_expert_parallel_demo()
    print("all distributed demos green")
