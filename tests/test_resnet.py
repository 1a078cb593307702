"""ResNet family: shapes, BatchNorm train/eval behavior at model level,
jit-compiled training (buffer writes captured), small-task convergence."""

import numpy as np

import lightgrad_tpu as light
import lightgrad_tpu.nn as nn
from lightgrad_tpu.autograd import TpuTensor
from lightgrad_tpu.models import resnet20, ResNet


def _digits(n):
    from lightgrad_tpu.data import _synthetic_digits

    xs, ys = _synthetic_digits(n)
    return xs.reshape(n, 1, 28, 28), ys.astype(np.int32)


def test_resnet_shapes():
    np.random.seed(0)
    net = resnet20(num_classes=10, in_channels=3)
    x = TpuTensor.from_numpy(
        np.random.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32),
        requires_grad=False)
    y = net(x)
    assert y.shape == (2, 10)
    n_params = sum(p.numel() for p in net.parameters())
    assert 0.25e6 < n_params < 0.31e6, n_params  # ResNet-20 is ~0.27M


def test_resnet_trains_jit():
    """Tiny ResNet learns synthetic digits under the compiled step; BatchNorm
    running stats advance inside the compiled program."""
    np.random.seed(0)
    net = ResNet([1, 1], [8, 16], num_classes=10, in_channels=1)
    optim = light.optim.Adam(net.parameters(), lr=3e-3)
    xs, ys = _digits(32 * 8)
    xs_d = TpuTensor.from_numpy(xs, requires_grad=False)
    ys_d = TpuTensor.from_numpy(ys, requires_grad=False)

    def step(off):
        x = xs_d.narrow(off, 32)
        y = ys_d.narrow(off, 32)
        loss = light.loss.cross_entropy(net(x), y)
        optim.zero_grad()
        loss.backward()
        optim.step()
        return loss

    fn = light.jit(step)
    offs = [TpuTensor.from_numpy(np.int32(i * 32), requires_grad=False)
            for i in range(8)]
    rm0 = net.blocks[0].b1.running_mean.numpy().copy()
    losses = []
    for ep in range(6):
        for off in offs:
            losses.append(float(fn(off).item()))
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    rm1 = net.blocks[0].b1.running_mean.numpy()
    assert not np.allclose(rm0, rm1), "running stats frozen under jit"

    # eval mode uses the running stats (deterministic, batch-independent)
    net.eval()
    with light.no_grad():
        a = net(xs_d.narrow(offs[0], 32)).numpy()
        b = net(xs_d.narrow(offs[0], 32)).numpy()
    np.testing.assert_array_equal(a, b)


def test_resnet_state_dict_roundtrip():
    np.random.seed(1)
    net = ResNet([1, 1], [4, 8], num_classes=5, in_channels=1)
    sd = net.state_dict()
    assert any(k.endswith("running_mean") for k in sd)
    np.random.seed(7)
    other = ResNet([1, 1], [4, 8], num_classes=5, in_channels=1)
    other.load_parameters(sd)
    x = TpuTensor.from_numpy(
        np.random.uniform(-1, 1, (2, 1, 12, 12)).astype(np.float32),
        requires_grad=False)
    net.eval(); other.eval()
    with light.no_grad():
        np.testing.assert_allclose(net(x).numpy(), other(x).numpy(),
                                   rtol=1e-5, atol=1e-6)
