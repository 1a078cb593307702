"""Interleaved-1F1B (virtual chunks under the 1F1B memory schedule):
gradient equivalence with sequential execution, bounded activation stash,
and bubble improvement over the flat schedule (VERDICT r2 #10)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >=4 virtual devices"
)

P_STAGES, V, DIM = 4, 2, 12


def _setup(n_micro, mb=4, seed=0):
    from jax.sharding import NamedSharding, PartitionSpec as P
    from lightgrad_tpu.parallel import make_mesh

    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.normal(0, 0.4, (P_STAGES, V, DIM, DIM)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (P_STAGES, V, DIM)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(n_micro, mb, DIM)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(n_micro, mb, DIM)).astype(np.float32))
    mesh = make_mesh(dp=1, tp=1, pp=P_STAGES)
    w_sh = jax.device_put(w, NamedSharding(mesh, P("pp")))
    b_sh = jax.device_put(b, NamedSharding(mesh, P("pp")))
    return mesh, (w, b), (w_sh, b_sh), x, y


def _stage(params, h):
    wi, bi = params
    return jnp.tanh(h @ wi + bi)


def _loss(y, t):
    return jnp.mean((y - t) ** 2)


def _sequential(params, x, y):
    """Oracle: virtual stage s = c*P + d applied in order via params[d, c]."""
    w, b = params
    losses = []
    for m in range(x.shape[0]):
        h = x[m]
        for c in range(V):
            for d in range(P_STAGES):
                h = _stage((w[d, c], b[d, c]), h)
        losses.append(_loss(h, y[m]))
    return jnp.mean(jnp.asarray(losses))


@needs_mesh
@pytest.mark.parametrize("n_micro", [4, 8])
def test_interleaved_1f1b_matches_sequential(n_micro):
    from lightgrad_tpu.parallel.pipeline_1f1b_interleaved import (
        pipeline_train_1f1b_interleaved)

    mesh, params, params_sh, x, y = _setup(n_micro)
    loss, grads = jax.jit(
        lambda p, xx, yy: pipeline_train_1f1b_interleaved(
            _stage, _loss, p, xx, yy, mesh, axis="pp", n_chunks=V)
    )(params_sh, x, y)

    want_loss = _sequential(params, x, y)
    gw, gb = jax.grad(lambda p: _sequential(p, x, y))(params)
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(grads[0]), np.asarray(gw),
                               rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(grads[1]), np.asarray(gb),
                               rtol=3e-4, atol=3e-5)


def test_interleaved_stash_bounded():
    """In-flight activations stay bounded by the stash depth even when
    n_micro >> P (the 1F1B property, kept under chunking)."""
    from lightgrad_tpu.parallel.pipeline_1f1b_interleaved import (
        interleaved_peak_in_flight)

    for m in (8, 16, 32):
        peak = interleaved_peak_in_flight(m, 4, 2)
        assert peak <= 2 * min(4, m), (m, peak)  # V chunks x slot depth


def test_interleaved_schedule_shape():
    """The schedule converges across configs, stays near the busy-tick ideal
    (2*M*V blocks per device), and its bubble is bounded by the m0 critical
    path (2*P*V hops at one tick of ring latency each).

    NOTE on the tick model: each hop costs a full tick here (communication
    is NOT overlapped with compute), so chunking cannot show Megatron's
    V-fold bubble shrink in tick counts -- that win appears when per-hop
    latency is small against per-block compute, which holds on real ICI but
    not in this latency-1 simulator.  What the schedule DOES guarantee:
    1F1B's bounded stash at every V (test above) with exact gradients."""
    from lightgrad_tpu.parallel.pipeline_1f1b_interleaved import (
        interleaved_ticks)

    for mm, pp, vv in ((16, 4, 2), (4, 4, 2), (8, 4, 3), (12, 2, 4), (5, 4, 2)):
        busy = 2 * mm * vv  # blocks per device
        t = interleaved_ticks(mm, pp, vv)
        assert busy <= t <= busy + 4 * pp * vv + 4, (mm, pp, vv, t)


@pytest.mark.slow  # 387 s: eager tape oracle re-pays per-op XLA:CPU compiles
@needs_mesh
def test_interleaved_module_bridge():
    """nn.Module blocks -> interleaved-1F1B via the data-swap bridge; grads
    land back on each block's .grad and match sequential tape execution."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    import lightgrad_tpu as light
    import lightgrad_tpu.nn as nn
    from lightgrad_tpu.autograd import TpuTensor
    from lightgrad_tpu.parallel import make_mesh
    from lightgrad_tpu.parallel.pipeline_1f1b_interleaved import (
        pipeline_train_1f1b_interleaved, module_stages_interleaved,
        load_module_grads_interleaved)

    Pn, Vv, dim, n_micro, mb = 2, 2, 8, 4, 4

    class Blk(nn.Module):
        def __init__(self):
            super().__init__()
            self.lin = nn.Linear(dim, dim)

        def forward(self, x):
            return self.lin(x).tanh()

    np.random.seed(3)
    blocks = [Blk() for _ in range(Pn * Vv)]
    stage_fn, stacked = module_stages_interleaved(blocks, Pn, Vv)
    mesh = make_mesh(dp=1, tp=1, pp=Pn)
    stacked = {n: jax.device_put(a, NamedSharding(mesh, P("pp")))
               for n, a in stacked.items()}
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(n_micro, mb, dim)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(n_micro, mb, dim)).astype(np.float32))

    def loss_fn(out, tgt):
        return jnp.mean((out - tgt) ** 2)

    loss, grads = pipeline_train_1f1b_interleaved(
        stage_fn, loss_fn, stacked, x, y, mesh, axis="pp", n_chunks=Vv)

    # sequential tape oracle over the SAME blocks (mean microbatch mse)
    for b in blocks:
        for p in b.parameters():
            p.zero_grad()
    total = None
    for m in range(n_micro):
        h = TpuTensor.from_numpy(np.asarray(x[m]), requires_grad=False)
        for blk in blocks:
            h = blk(h)
        tgt = TpuTensor.from_numpy(np.asarray(y[m]), requires_grad=False)
        lm = light.loss.mse(h, tgt) * 2.0  # our mse halves; loss_fn does not
        total = lm if total is None else total + lm
    mean_loss = total * (1.0 / n_micro)
    mean_loss.backward()
    np.testing.assert_allclose(float(loss), float(mean_loss.item()), rtol=2e-5)
    want = [{n: p.grad.numpy().copy() for n, p in b.named_parameters()}
            for b in blocks]

    # bridge the stacked grads back onto the blocks and compare
    load_module_grads_interleaved(blocks, grads, Pn, Vv)
    for s_idx, b in enumerate(blocks):
        for n, p in b.named_parameters():
            np.testing.assert_allclose(
                p.grad.numpy(), want[s_idx][n], rtol=3e-4, atol=3e-5,
                err_msg=f"stage {s_idx} {n}")


@pytest.mark.slow  # 476 s: interpret-mode flash + tape oracle
@needs_mesh
def test_interleaved_gpt_block_stack():
    """A real GPT transformer block stack (models/gpt.py GPTBlock: causal
    flash attention + gelu MLP + LayerNorms, ~50k params per block) drives
    through module_stages_interleaved + pipeline_train_1f1b_interleaved on
    pp=2 with 2 virtual chunks; per-block grads match the sequential tape
    (ROADMAP 'Parallelism': model-level interleaved pipeline run)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    import lightgrad_tpu as light
    from lightgrad_tpu.autograd import TpuTensor
    from lightgrad_tpu.models.gpt import GPTBlock, GPTConfig
    from lightgrad_tpu.parallel import make_mesh
    from lightgrad_tpu.parallel.pipeline_1f1b_interleaved import (
        pipeline_train_1f1b_interleaved, module_stages_interleaved,
        load_module_grads_interleaved)

    Pn, Vv, n_micro, mb, seq = 2, 2, 4, 2, 8
    cfg = GPTConfig(vocab_size=32, n_positions=seq, n_embd=16, n_layer=4,
                    n_head=2)
    np.random.seed(7)
    blocks = [GPTBlock(cfg) for _ in range(Pn * Vv)]
    stage_fn, stacked = module_stages_interleaved(blocks, Pn, Vv)
    mesh = make_mesh(dp=1, tp=1, pp=Pn)
    stacked = {n: jax.device_put(a, NamedSharding(mesh, P("pp")))
               for n, a in stacked.items()}
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(n_micro, mb, seq, cfg.n_embd))
                    .astype(np.float32) * 0.5)
    y = jnp.asarray(rng.normal(size=(n_micro, mb, seq, cfg.n_embd))
                    .astype(np.float32) * 0.5)

    loss, grads = pipeline_train_1f1b_interleaved(
        stage_fn, loss_fn=lambda out, tgt: jnp.mean((out - tgt) ** 2),
        stacked_params=stacked, x_micro=x, y_micro=y, mesh=mesh, axis="pp",
        n_chunks=Vv)

    for b in blocks:
        for p in b.parameters():
            p.zero_grad()
    total = None
    for m in range(n_micro):
        h = TpuTensor.from_numpy(np.asarray(x[m]), requires_grad=False)
        for blk in blocks:
            h = blk(h)
        tgt = TpuTensor.from_numpy(np.asarray(y[m]), requires_grad=False)
        lm = light.loss.mse(h, tgt) * 2.0
        total = lm if total is None else total + lm
    mean_loss = total * (1.0 / n_micro)
    mean_loss.backward()
    np.testing.assert_allclose(float(loss), float(mean_loss.item()),
                               rtol=2e-5)

    want = [{n: p.grad.numpy().copy() for n, p in b.named_parameters()}
            for b in blocks]
    load_module_grads_interleaved(blocks, grads, Pn, Vv)
    for s_idx, b in enumerate(blocks):
        for n, p in b.named_parameters():
            np.testing.assert_allclose(
                p.grad.numpy(), want[s_idx][n], rtol=5e-4, atol=5e-5,
                err_msg=f"stage {s_idx} {n}")
