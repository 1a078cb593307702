"""The jit step-compiler's recording phase.

Default mode discovers the read/write/capture sets by ABSTRACT tracing
(``jax.eval_shape`` -- zero array math; jit.py ``_record_abstract``); the
round-2 eager recording survives as ``LIGHTGRAD_RECORD=eager``.  These tests
pin the behaviors the switch changed:

* zero-argument (pure-closure) steps stage abstractly under omnistaging;
* the first call's result comes from the compiled program (device numerics);
* discovery leaves no tracer behind in live objects (params, grads,
  optimizer and scaler state);
* state tensors created lazily inside the first step would be invisible to
  capture -- GradScaler pre-materializes via MixedPrecision, and dynamic
  scale GROWTH (frozen under the old eager-record design) works in-jit;
* both recording modes produce the same training trajectory.

Reference parity note: the reference has no step compiler at all (one
OpenCL kernel launch per tape op, SURVEY.md §3.3) -- this subsystem is
TPU-native surface.
"""

import numpy as np
import pytest

import lightgrad_tpu as light
from lightgrad_tpu import amp
from lightgrad_tpu.autograd import TpuTensor


class TwoLayer(light.nn.Module):
    def __init__(self):
        super().__init__()
        self.l1 = light.nn.Linear(6, 16)
        self.l2 = light.nn.Linear(16, 3)

    def forward(self, x):
        return self.l2(self.l1(x).relu())


def _data(seed=0, n=16):
    rng = np.random.default_rng(seed)
    x = TpuTensor.from_numpy(rng.uniform(-1, 1, (n, 6)).astype(np.float32))
    y = TpuTensor.from_numpy(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    for t in (x, y):
        t._set_requires_grad(False)
    return x, y


def _train(mode, monkeypatch, steps=8, seed=3):
    monkeypatch.setenv("LIGHTGRAD_RECORD", mode)
    np.random.seed(seed)
    model = TwoLayer()
    opt = light.optim.Adam(model.parameters(), lr=1e-2)
    x, y = _data(seed=seed)

    def step(a, b):
        opt.zero_grad()
        loss = light.loss.mse(model(a), b)
        loss.backward()
        opt.step()
        return loss

    fn = light.jit(step)
    losses = [float(fn(x, y).numpy()) for _ in range(steps)]
    return model, losses


def test_abstract_record_trains(monkeypatch):
    model, losses = _train("abstract", monkeypatch)
    assert losses[-1] < losses[0]
    assert all(np.isfinite(v) for v in losses)
    # no tracer leaked into live state: params and grads are materialized
    for p in model.parameters():
        assert np.isfinite(p.numpy()).all()
        if p.grad is not None:
            assert np.isfinite(p.grad.numpy()).all()


def test_abstract_matches_eager_trajectory(monkeypatch):
    """Steps 2+ run the identical compiled program in both modes; step 1
    differs only by eager-mode's host-numerics first step (small)."""
    _, abstract = _train("abstract", monkeypatch)
    _, eager = _train("eager", monkeypatch)
    np.testing.assert_allclose(abstract, eager, rtol=2e-3, atol=2e-5)


def test_zero_arg_closure_step(monkeypatch):
    """A step that reads ALL tensors from closures (no tensor args): under
    omnistaging the eval_shape discovery still stages every op abstractly
    (bench.py's GPT stage is this shape)."""
    monkeypatch.setenv("LIGHTGRAD_RECORD", "abstract")
    np.random.seed(5)
    model = TwoLayer()
    opt = light.optim.SGD(model.parameters(), lr=5e-2, momentum=0.9)
    x, y = _data(seed=5)

    def step():
        opt.zero_grad()
        loss = light.loss.mse(model(x), y)
        loss.backward()
        opt.step()
        return loss

    fn = light.jit(step)
    losses = [float(fn().numpy()) for _ in range(8)]
    assert losses[-1] < losses[0]
    assert all(np.isfinite(v) for v in losses)


def test_gradient_accumulation_matches_full_batch(monkeypatch):
    """Two micro-batch backward passes inside ONE compiled step (no zero_grad
    between them) accumulate to the full-batch gradient: the standard
    grad-accumulation recipe for batches that exceed chip memory.  The tape's
    ``add_grad`` accumulation is what makes this work under the step
    compiler."""
    monkeypatch.setenv("LIGHTGRAD_RECORD", "abstract")
    x, y = _data(seed=7, n=16)
    xa, xb = x.narrow(0, 8), x.narrow(8, 8)
    ya, yb = y.narrow(0, 8), y.narrow(8, 8)

    def build():
        np.random.seed(11)
        model = TwoLayer()
        opt = light.optim.Adam(model.parameters(), lr=1e-2)
        return model, opt

    # accumulated: mean-of-micro-losses == full-batch mean for equal splits
    model_a, opt_a = build()

    def step_accum():
        opt_a.zero_grad()
        for mx, my in ((xa, ya), (xb, yb)):
            loss = light.loss.mse(model_a(mx), my) * 0.5
            loss.backward()
        opt_a.step()
        return loss

    # full batch
    model_f, opt_f = build()

    def step_full():
        opt_f.zero_grad()
        loss = light.loss.mse(model_f(x), y)
        loss.backward()
        opt_f.step()
        return loss

    fa, ff = light.jit(step_accum), light.jit(step_full)
    for _ in range(4):
        fa(), ff()
    for (na, pa), (nf, pf) in zip(model_a.named_parameters(),
                                  model_f.named_parameters()):
        np.testing.assert_allclose(pa.numpy(), pf.numpy(), rtol=2e-4,
                                   atol=2e-5, err_msg=na)


def test_scaler_growth_inside_jit(monkeypatch):
    """Dynamic loss-scale growth across compiled steps.

    Under the old eager-record design the lazily-created scaler state was
    baked into the program as a constant -- the scale silently froze at its
    step-1 value and growth_interval never fired.  MixedPrecision now
    materializes the state before recording, so it is captured/donated like
    optimizer moments and grows in-jit."""
    monkeypatch.setenv("LIGHTGRAD_RECORD", "abstract")
    np.random.seed(7)
    model = TwoLayer()
    scaler = amp.GradScaler(init_scale=4.0, growth_factor=2.0,
                            growth_interval=3)
    mp = amp.MixedPrecision(model, lambda ps: light.optim.Adam(ps, lr=1e-3),
                            scaler=scaler)
    x, y = _data(seed=7)
    xb = x.astype(mp.compute_dtype).detach()._set_requires_grad(False)
    yb = y.astype(mp.compute_dtype).detach()._set_requires_grad(False)

    def step(a, b):
        loss = light.loss.mse(model(a), b)
        mp.zero_grad()
        mp.scale(loss).backward()
        mp.step()
        return loss

    fn = light.jit(step)
    for _ in range(7):  # 7 good steps, growth_interval=3 -> two growths
        l = fn(xb, yb)
    assert np.isfinite(float(l.numpy()))
    assert scaler.scale_value() == pytest.approx(16.0)


def test_device_init_trains_and_is_seeded():
    """set_device_init: params generated by the on-device jax PRNG (no host
    upload); same seed -> same params; None restores the host RNG."""
    light.set_device_init(11)
    try:
        a = light.nn.Linear(8, 4)
        light.set_device_init(11)
        b = light.nn.Linear(8, 4)
        np.testing.assert_array_equal(a.weight.numpy(), b.weight.numpy())
        assert a.weight.numpy().std() > 0
    finally:
        light.set_device_init(None)
    # host path unaffected afterwards
    np.random.seed(2)
    c = light.nn.Linear(8, 4)
    np.random.seed(2)
    d = light.nn.Linear(8, 4)
    np.testing.assert_array_equal(c.weight.numpy(), d.weight.numpy())


def test_discovery_failure_falls_back_to_eager():
    """Concrete value inspection inside fn breaks eval_shape discovery; the
    recorder must fall back to eager recording and still produce a working
    compiled step."""
    from lightgrad_tpu.autograd import TpuTensor

    w = TpuTensor.from_numpy(np.ones((3,), np.float32))

    def step(x):
        # .item() on an interior tensor is un-traceable -> discovery fails
        scale = float((x * 0 + 2).sum().item()) / 3.0
        return x * w * scale

    fn = light.jit(step)
    x = TpuTensor.from_numpy(np.arange(3, dtype=np.float32),
                             requires_grad=False)
    with pytest.warns(UserWarning, match="falling back to eager"):
        y = fn(x)
    np.testing.assert_allclose(y.numpy(), np.arange(3, dtype=np.float32) * 2)


def test_compile_error_does_not_fall_back_to_eager(monkeypatch):
    """A failure in compile/run (e.g. device OOM) propagates unchanged --
    re-recording eagerly would only hit the same wall minutes later."""
    import importlib

    jit_mod = importlib.import_module("lightgrad_tpu.jit")
    from lightgrad_tpu.autograd import TpuTensor

    def boom(self, state, args):
        raise RuntimeError("RESOURCE_EXHAUSTED: pretend the program is 20GB")

    monkeypatch.setattr(jit_mod._CompiledStep, "_compile", boom)
    fn = light.jit(lambda x: x * 2.0)
    x = TpuTensor.from_numpy(np.ones((2,), np.float32), requires_grad=False)
    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        fn(x)
