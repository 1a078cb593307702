"""ResNet family: shapes, BatchNorm train/eval behavior at model level,
jit-compiled training (buffer writes captured), small-task convergence."""

import numpy as np
import pytest

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


@pytest.mark.slow  # 216 s: deep conv stack jit compile on the 1-core host
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


def test_torchvision_import_roundtrip():
    """A state dict in torchvision's naming (conv1/bn1, layer{L}.{B}.*,
    downsample.*) loads into resnet18 and reproduces the source model --
    built by exporting our params under the inverse name mapping, since
    torchvision itself is not installed."""
    from lightgrad_tpu.models.resnet import resnet18, load_torchvision_state_dict

    np.random.seed(3)
    src = resnet18(num_classes=10)
    sd = src.state_dict()

    # our names -> torchvision names (inverse of load_torchvision_state_dict)
    tv = {}
    stage_blocks = (2, 2, 2, 2)
    flat = [(li + 1, bi) for li, n in enumerate(stage_blocks) for bi in range(n)]
    for k, v in sd.items():
        if k.startswith("stem."):
            tv["conv1." + k[5:].replace("w", "weight")] = v
        elif k.startswith("bstem."):
            tv["bn1." + k[6:]] = v
        elif k.startswith("blocks."):
            _, i, rest = k.split(".", 2)
            li, bi = flat[int(i)]
            rest = (rest.replace("c1.w", "conv1.weight")
                        .replace("c2.w", "conv2.weight")
                        .replace("b1.", "bn1.").replace("b2.", "bn2.")
                        .replace("bproj.", "downsample.1.")
                        .replace("proj.w", "downsample.0.weight"))
            # bproj was rewritten to downsample.0-prefixed by the proj rule;
            # fix the order: apply bproj first in a fresh pass
            tv[f"layer{li}.{bi}." + rest] = v
        else:
            tv[k] = v
    # bproj.* must map to downsample.1.*; the chained replace above turns
    # "bproj." into "downsample.0.roj." only if ordered wrong -- assert not
    assert not any("roj" in k for k in tv), [k for k in tv if "roj" in k]

    np.random.seed(11)
    dst = resnet18(num_classes=10)
    load_torchvision_state_dict(dst, tv)

    x = TpuTensor.from_numpy(
        np.random.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32),
        requires_grad=False)
    src.eval(); dst.eval()
    with light.no_grad():
        a, b = src(x).numpy(), dst(x).numpy()
    assert a.shape == (2, 10)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_resnet18_imagenet_stem_shapes():
    """conv7/s2 + 3x3/s2 overlapping max pool: 224 -> 112 -> 56 spatial."""
    from lightgrad_tpu.models.resnet import resnet18

    np.random.seed(5)
    net = resnet18(num_classes=7)
    x = TpuTensor.from_numpy(
        np.random.uniform(-1, 1, (1, 3, 224, 224)).astype(np.float32),
        requires_grad=False)
    net.eval()
    with light.no_grad():
        y = net.bstem(net.stem(x)).relu()
        assert y.shape == (1, 64, 112, 112), y.shape
        p = y.max_pool2d(kernel=(3, 3), stride=(2, 2), padding=1)
        assert p.shape == (1, 64, 56, 56), p.shape
        out = net(x)
    assert out.shape == (1, 7)
