"""Learning-rate schedules, compatible with the step compiler.

The reference has no schedulers (optimizer hyperparams are constructor
constants, ``/root/reference/lightgrad/optim.py:19``).  The TPU wrinkle:
under ``lightgrad_tpu.jit`` a python-float ``lr`` is baked into the
compiled program as a constant, so a schedule that mutates ``optim.lr``
would silently do nothing.  ``LRScheduler`` therefore promotes the
optimizer's ``lr`` to a rank-0 tensor: compiled steps capture it as a
RUNTIME input (jit.py passes captured tensor data afresh on every
dispatch), so in-place updates from ``scheduler.step()`` reach already-
compiled programs with no re-record.

Construct the scheduler BEFORE compiling a step so the recording sees the
tensor-valued lr::

    optim = light.optim.Adam(model.parameters(), lr=3e-4)
    sched = light.schedule.WarmupCosine(optim, warmup=100, total=10_000)
    step = light.jit(train_step)
    for batch in data:
        step(*batch)
        sched.step()
"""

import math

import numpy as np

__all__ = ["LRScheduler", "StepLR", "CosineAnnealingLR", "WarmupCosine"]


class LRScheduler:
    """Base: owns the step counter and the tensor-resident lr."""

    def __init__(self, optimizer):
        self.optim = optimizer
        self.base_lr = float(
            optimizer.lr if not hasattr(optimizer.lr, "numpy")
            else optimizer.lr.item())
        proto = type(optimizer.parameters[0])
        self._lr_t = proto.from_numpy(
            np.asarray(self.base_lr, np.float32), requires_grad=False)
        optimizer.lr = self._lr_t
        self.step_n = 0

    def get_lr(self) -> float:
        """Schedule value at the current step (host-side float math)."""
        raise NotImplementedError()

    @property
    def last_lr(self) -> float:
        return float(self._lr_t.numpy())

    def step(self):
        """Advance one step and write the new lr into the live tensor."""
        self.step_n += 1
        v = np.asarray(self.get_lr(), np.float32)
        self._lr_t._set_data(
            type(self._lr_t).from_numpy(v, requires_grad=False)._raw_data())
        return self.last_lr


class StepLR(LRScheduler):
    """Multiply lr by ``gamma`` every ``step_size`` steps."""

    def __init__(self, optimizer, step_size: int, gamma: float = 0.1):
        super().__init__(optimizer)
        self.step_size, self.gamma = int(step_size), float(gamma)

    def get_lr(self):
        return self.base_lr * self.gamma ** (self.step_n // self.step_size)


class CosineAnnealingLR(LRScheduler):
    """Cosine decay from base lr to ``eta_min`` over ``t_max`` steps."""

    def __init__(self, optimizer, t_max: int, eta_min: float = 0.0):
        super().__init__(optimizer)
        self.t_max, self.eta_min = int(t_max), float(eta_min)

    def get_lr(self):
        t = min(self.step_n, self.t_max)
        cos = 0.5 * (1 + math.cos(math.pi * t / self.t_max))
        return self.eta_min + (self.base_lr - self.eta_min) * cos


class WarmupCosine(LRScheduler):
    """Linear warmup to base lr over ``warmup`` steps, then cosine decay to
    ``min_lr`` at ``total`` steps -- the standard transformer recipe."""

    def __init__(self, optimizer, warmup: int, total: int, min_lr: float = 0.0):
        super().__init__(optimizer)
        assert total > warmup >= 0
        self.warmup, self.total, self.min_lr = int(warmup), int(total), float(min_lr)

    def get_lr(self):
        t = self.step_n
        if t < self.warmup:
            return self.base_lr * t / self.warmup
        frac = min(1.0, (t - self.warmup) / (self.total - self.warmup))
        cos = 0.5 * (1 + math.cos(math.pi * frac))
        return self.min_lr + (self.base_lr - self.min_lr) * cos
