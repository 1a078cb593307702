"""LR schedulers: schedule math + live updates into compiled steps."""

import numpy as np
import pytest

import lightgrad_tpu as light
import lightgrad_tpu.nn as nn
from lightgrad_tpu.autograd import CpuTensor, TpuTensor


def _optim(backend_cls=CpuTensor, lr=0.1):
    w = backend_cls.from_numpy(np.ones((4, 4), np.float32))
    return light.optim.SGD([w], lr=lr), w


def test_step_lr_values():
    optim, _ = _optim()
    s = light.schedule.StepLR(optim, step_size=3, gamma=0.5)
    lrs = [s.step() for _ in range(7)]
    np.testing.assert_allclose(
        lrs, [0.1, 0.1, 0.05, 0.05, 0.05, 0.025, 0.025], rtol=1e-6)


def test_cosine_endpoints():
    optim, _ = _optim(lr=1.0)
    s = light.schedule.CosineAnnealingLR(optim, t_max=10, eta_min=0.1)
    vals = [s.step() for _ in range(12)]
    assert vals[4] == pytest.approx(0.55, abs=1e-6)  # halfway
    assert vals[9] == pytest.approx(0.1, abs=1e-6)   # floor at t_max
    assert vals[11] == pytest.approx(0.1, abs=1e-6)  # stays at floor


def test_warmup_cosine_shape():
    optim, _ = _optim(lr=1.0)
    s = light.schedule.WarmupCosine(optim, warmup=4, total=12, min_lr=0.0)
    vals = [s.step() for _ in range(12)]
    assert vals[0] < vals[1] < vals[2] < vals[3] == pytest.approx(1.0)
    assert all(a >= b for a, b in zip(vals[3:], vals[4:]))  # decays after
    assert vals[-1] == pytest.approx(0.0, abs=1e-6)


def test_scheduled_lr_is_tensor_in_optimizer_math():
    """The promoted lr participates in tensor expressions (SGD delta)."""
    optim, w = _optim(lr=0.5)
    light.schedule.StepLR(optim, step_size=1, gamma=0.5)
    w.zero_grad()
    g = CpuTensor.from_numpy(np.ones((4, 4), np.float32), requires_grad=False)
    w.add_grad(g)
    optim.step()
    np.testing.assert_allclose(w.numpy(), np.ones((4, 4)) - 0.5, rtol=1e-6)


def test_schedule_reaches_compiled_step(monkeypatch):
    """lr updates must flow into an ALREADY-compiled step (the lr tensor is
    captured as a runtime input, not baked as a constant)."""
    monkeypatch.setenv("LIGHTGRAD_STAGE_RECORD", "0")
    np.random.seed(5)
    model = nn.Linear(4, 4)
    model.map_parameters(lambda p: p.tpu())
    optim = light.optim.SGD(model.parameters(), lr=0.1)
    sched = light.schedule.StepLR(optim, step_size=1, gamma=0.0)  # lr -> 0
    x = TpuTensor.from_numpy(np.random.rand(8, 4).astype(np.float32),
                             requires_grad=False)
    y = TpuTensor.from_numpy(np.random.rand(8, 4).astype(np.float32),
                             requires_grad=False)

    def step(x, y):
        loss = light.loss.mse(model(x), y)
        optim.zero_grad()
        loss.backward()
        optim.step()
        return loss

    fn = light.jit(step)
    for _ in range(3):  # record, compile, dispatch -- lr still 0.1
        fn(x, y)
    moved = [p.numpy().copy() for p in model.parameters()]
    sched.step()       # lr -> 0 without touching the compiled program
    fn(x, y)
    frozen = [p.numpy() for p in model.parameters()]
    for a, b in zip(moved, frozen):
        np.testing.assert_array_equal(a, b)  # zero lr => params unchanged
