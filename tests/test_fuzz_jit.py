"""Differential fuzz for the step compiler: random architectures trained
with light.jit must land on the same parameters as the eager tape.

Complements tests/test_fuzz_grads.py (random op trees vs jax.grad): here
the unit under test is jit.py's record/compile/write-back pipeline --
capture discovery, in-place param/optimizer-state updates, donation --
across randomly composed models, not a fixed architecture.
"""

import numpy as np
import pytest

import lightgrad_tpu as light
import lightgrad_tpu.nn as nn
from lightgrad_tpu.autograd import TpuTensor


def random_model(rng):
    """A random small Sequential: conv or linear front, random middle."""
    layers = []
    conv_front = rng.random() < 0.5
    if conv_front:
        ch = int(rng.integers(2, 5))
        layers += [nn.Conv2d(1, ch, kernelsize=3, pad="same"),
                   nn.ReLU(),
                   nn.Flatten()]
        feats = ch * 36
    else:
        layers.append(nn.Flatten())
        feats = 36
    width = int(rng.integers(8, 24))
    layers.append(nn.Linear(feats, width))
    for _ in range(int(rng.integers(1, 3))):
        kind = rng.integers(0, 4)
        if kind == 0:
            layers.append(nn.GELU())
        elif kind == 1:
            layers.append(nn.Tanh())
        elif kind == 2:
            layers.append(nn.LayerNorm(width))
        else:
            layers.append(nn.ReLU())
            layers.append(nn.Linear(width, width))
    layers.append(nn.Linear(width, 5))
    return nn.Sequential(*layers)


def train(model, opt_cls, lr, x, y, steps, use_jit):
    opt = opt_cls(model.parameters(), lr=lr)

    def step():
        loss = light.loss.cross_entropy(model(x), y)
        opt.zero_grad()
        loss.backward()
        opt.step()
        return loss

    fn = light.jit(step) if use_jit else step
    return [fn().item() for _ in range(steps)]


@pytest.mark.parametrize("seed", range(4))
def test_random_model_jit_matches_eager(seed):
    rng = np.random.default_rng(seed)
    np.random.seed(seed)
    m1 = random_model(rng)
    snapshot = {k: np.array(v) for k, v in m1.state_dict().items()}

    rng2 = np.random.default_rng(seed)
    np.random.seed(seed + 1000)  # different init, then overwritten
    m2 = random_model(rng2)     # same architecture: same rng stream
    m2.load_parameters(snapshot)

    opt_cls = [light.optim.SGD, light.optim.Adam,
               light.optim.RMSprop][seed % 3]
    x_np = rng.normal(size=(8, 1, 6, 6)).astype(np.float32)
    y_np = (np.arange(8) % 5).astype(np.int32)
    x = TpuTensor.from_numpy(x_np, requires_grad=False)
    y = TpuTensor.from_numpy(y_np, requires_grad=False)

    eager = train(m1, opt_cls, 3e-3, x, y, steps=5, use_jit=False)
    jitted = train(m2, opt_cls, 3e-3, x, y, steps=5, use_jit=True)

    np.testing.assert_allclose(eager, jitted, rtol=2e-4, atol=2e-6)
    for (k1, v1), (k2, v2) in zip(sorted(m1.state_dict().items()),
                                  sorted(m2.state_dict().items())):
        assert k1 == k2
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   rtol=2e-4, atol=2e-6, err_msg=k1)
