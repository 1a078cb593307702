"""1F1B pipeline training schedule (ROADMAP: true memory schedule).

The claim under test: same loss/gradients as sequential execution, with
(a) schedule length 2*(M + P - 1) block-ticks (the 1F1B optimum for equal
fwd/bwd block times) and (b) at most P in-flight activations per device --
the memory property jax.grad over GPipe cannot give (it stores all M).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lightgrad_tpu.parallel import make_mesh, pipeline_train_1f1b
from lightgrad_tpu.parallel.pipeline_1f1b import (
    _arrival_tables, onef_oneb_ticks, peak_in_flight)

needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >= 4 devices")


def _stage(wi, h):
    return jnp.tanh(h @ wi)


def _loss(y, t):
    return jnp.mean((y - t) ** 2)


def _ref(w, xs, ys, pp):
    def f(w):
        tot = 0.0
        for m in range(xs.shape[0]):
            hm = xs[m]
            for s in range(pp):
                hm = _stage(w[s], hm)
            tot = tot + _loss(hm, ys[m])
        return tot / xs.shape[0]

    return jax.value_and_grad(f)(w)


@needs_mesh
@pytest.mark.parametrize("n_micro", [1, 3, 4, 8, 12])
def test_1f1b_matches_sequential(n_micro):
    pp, mb, dim = 4, 2, 8
    mesh = make_mesh(dp=1, tp=1, pp=pp)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.4, (pp, dim, dim)).astype(np.float32))
    xs = jnp.asarray(rng.normal(size=(n_micro, mb, dim)).astype(np.float32))
    ys = jnp.asarray(rng.normal(size=(n_micro, mb, dim)).astype(np.float32))
    loss, grads = jax.jit(
        lambda w, xs, ys: pipeline_train_1f1b(
            _stage, _loss, w, xs, ys, mesh))(w, xs, ys)
    want, gwant = _ref(w, xs, ys, pp)
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(grads), np.asarray(gwant),
                               rtol=1e-5, atol=1e-6)


@needs_mesh
def test_1f1b_pytree_params():
    """Stage params as a dict pytree (the nn.Module state_dict shape)."""
    pp, mb, dim = 4, 2, 8
    mesh = make_mesh(dp=1, tp=1, pp=pp)
    rng = np.random.default_rng(1)
    w = {"w": jnp.asarray(rng.normal(0, 0.4, (pp, dim, dim)).astype(np.float32)),
         "b": jnp.asarray(rng.normal(0, 0.1, (pp, dim)).astype(np.float32))}

    def stage(p, h):
        return jnp.tanh(h @ p["w"] + p["b"])

    M = 6
    xs = jnp.asarray(rng.normal(size=(M, mb, dim)).astype(np.float32))
    ys = jnp.asarray(rng.normal(size=(M, mb, dim)).astype(np.float32))
    loss, grads = jax.jit(
        lambda w, xs, ys: pipeline_train_1f1b(
            stage, _loss, w, xs, ys, mesh))(w, xs, ys)

    def f(w):
        tot = 0.0
        for m in range(M):
            hm = xs[m]
            for s in range(pp):
                hm = stage({"w": w["w"][s], "b": w["b"][s]}, hm)
            tot = tot + _loss(hm, ys[m])
        return tot / M

    want, gwant = jax.value_and_grad(f)(w)
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-6)
    for k in w:
        np.testing.assert_allclose(np.asarray(grads[k]),
                                   np.asarray(gwant[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_1f1b_schedule_properties():
    """Optimal tick count and bounded in-flight window, across a sweep.

    2*(M+P-1) is the 1F1B flush optimum in uniform block-ticks; peak
    in-flight <= min(P, M) is the memory bound (GPipe-with-autodiff would
    be M).  _arrival_tables also asserts stash-slot collision freedom."""
    for M in range(1, 20):
        for P in (2, 4, 8):
            assert onef_oneb_ticks(M, P) == 2 * (M + P - 1), (M, P)
            assert peak_in_flight(M, P) <= min(P, M), (M, P)
            _arrival_tables(M, P)  # asserts internally


@needs_mesh
@pytest.mark.slow
def test_module_stages_bridge():
    """nn.Module blocks -> 1F1B via the data-swap bridge: gradients match
    the eager tape running the same blocks sequentially."""
    import lightgrad_tpu as light
    import lightgrad_tpu.nn as nn
    from lightgrad_tpu.autograd import TpuTensor
    from lightgrad_tpu.parallel.pipeline_1f1b import (
        module_stages, load_module_grads)

    pp, mb, dim, M = 4, 2, 8, 6
    mesh = make_mesh(dp=1, tp=1, pp=pp)
    np.random.seed(9)

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.lin = nn.Linear(dim, dim)

        def forward(self, x):
            return self.lin(x).tanh()

    blocks = [Block() for _ in range(pp)]
    for b in blocks:
        b.map_parameters(lambda p: p.tpu())
    stage_fn, stacked = module_stages(blocks)

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(M, mb, dim)).astype(np.float32))
    ys = jnp.asarray(rng.normal(size=(M, mb, dim)).astype(np.float32))

    def loss_fn(y, t):
        return jnp.mean((y - t) ** 2)

    loss, grads = pipeline_train_1f1b(
        stage_fn, loss_fn, stacked, xs, ys, mesh)

    # oracle: the same modules on the eager tape, sequential microbatches
    total = None
    for b in blocks:
        for p in b.parameters():
            p.zero_grad()
    for m in range(M):
        h = TpuTensor(xs[m], requires_grad=False)
        for b in blocks:
            h = b(h)
        l = light.loss.mse(h, TpuTensor(ys[m], requires_grad=False)) * (2.0 / M)
        # mse halves the square; our loss_fn does not -> x2
        l.backward()
        total = float(l.numpy()) + (total or 0.0)
    np.testing.assert_allclose(float(loss), total, rtol=1e-5)
    for i, b in enumerate(blocks):
        for n, p in b.named_parameters():
            np.testing.assert_allclose(
                np.asarray(grads[n][i]), p.grad.numpy(),
                rtol=1e-4, atol=1e-6, err_msg=f"block{i}.{n}")

    # write-back path drives a standard optimizer
    load_module_grads(blocks, grads)
    w_before = blocks[0].lin.weight.numpy().copy()
    optim = light.optim.SGD([p for b in blocks for p in b.parameters()], lr=0.5)
    optim.step()
    assert not np.allclose(w_before, blocks[0].lin.weight.numpy())
