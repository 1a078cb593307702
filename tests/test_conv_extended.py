"""Dilated + grouped convolution, validated against torch.nn.functional.conv2d
(forward and both gradients) on the CPU oracle and the TPU backend, plus the
nn.Conv2d layer-level plumbing ("same" padding uses the effective kernel)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from lightgrad_tpu.autograd import CpuTensor, TpuTensor

CASES = [
    # (B, Cin, H, W), (Cout, Cin/g, kh, kw), stride, dilation, groups
    ((2, 4, 9, 9), (6, 4, 3, 3), 1, 2, 1),
    ((2, 4, 11, 11), (6, 4, 3, 3), 2, 2, 1),
    ((2, 6, 8, 8), (9, 2, 3, 3), 1, 1, 3),
    ((2, 4, 10, 10), (4, 1, 3, 3), 2, 1, 4),   # depthwise
    ((1, 4, 12, 12), (8, 2, 3, 3), 2, 2, 2),   # stride+dilation+groups
]


def _torch_oracle(x, w, stride, dilation, groups):
    xt = torch.tensor(x, requires_grad=True)
    wt = torch.tensor(w, requires_grad=True)
    y = F.conv2d(xt, wt, stride=stride, dilation=dilation, groups=groups)
    y.backward(torch.ones_like(y))
    return (y.detach().numpy(), xt.grad.numpy(), wt.grad.numpy())


@pytest.mark.parametrize("cls", [CpuTensor, TpuTensor])
@pytest.mark.parametrize("case", CASES)
def test_conv_dilation_groups_vs_torch(cls, case):
    xs, ws, stride, dilation, groups = case
    rng = np.random.default_rng(abs(hash(case)) % 2**31)
    x = rng.normal(0, 0.5, xs).astype(np.float32)
    w = rng.normal(0, 0.5, ws).astype(np.float32)
    want_y, want_gx, want_gw = _torch_oracle(x, w, stride, dilation, groups)

    xt = cls.from_numpy(x)
    wt = cls.from_numpy(w)
    y = xt.conv(wt, strides=stride, dilation=dilation, groups=groups)
    np.testing.assert_allclose(y.numpy(), want_y, rtol=1e-4, atol=1e-4)
    y.backward(allow_fill=True)
    np.testing.assert_allclose(xt.grad.numpy(), want_gx, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(wt.grad.numpy(), want_gw, rtol=1e-4, atol=1e-4)


def test_conv2d_layer_same_padding_dilated():
    """'same' padding must use the dilated (effective) kernel size."""
    import lightgrad_tpu.nn as nn

    layer = nn.Conv2d(4, 8, kernelsize=3, pad="same", dilation=2, bias=False)
    x = TpuTensor.from_numpy(np.random.rand(2, 4, 16, 16).astype(np.float32))
    y = layer(x)
    assert y.shape == (2, 8, 16, 16)


def test_conv2d_layer_groups_param_shape():
    import lightgrad_tpu.nn as nn

    layer = nn.Conv2d(8, 12, kernelsize=3, groups=4)
    assert layer.w.shape == (12, 2, 3, 3)
    x = TpuTensor.from_numpy(np.random.rand(1, 8, 8, 8).astype(np.float32))
    assert layer(x).shape == (1, 12, 8, 8)


# ---------------------------------------------------------------------------
# transposed convolution (conv_transpose composite + nn.ConvTranspose2d)
# ---------------------------------------------------------------------------
CT_CASES = [
    # (B, Cin, H, W), (Cin, Cout/g, kh, kw), stride, pad, opad, dilation, groups
    ((2, 3, 5, 5), (3, 4, 3, 3), 1, 0, 0, 1, 1),
    ((2, 3, 5, 5), (3, 4, 3, 3), 2, 0, 1, 1, 1),
    ((1, 4, 6, 6), (4, 2, 3, 3), 2, 1, 0, 1, 2),
    ((2, 2, 7, 7), (2, 3, 3, 3), 1, 2, 0, 2, 1),
    ((1, 3, 4, 4), (3, 5, 2, 2), 3, 0, 2, 1, 1),
]


def _torch_ct_oracle(x, w, stride, pad, opad, dilation, groups):
    xt = torch.tensor(x, requires_grad=True)
    wt = torch.tensor(w, requires_grad=True)
    y = F.conv_transpose2d(xt, wt, stride=stride, padding=pad,
                           output_padding=opad, dilation=dilation,
                           groups=groups)
    y.backward(torch.ones_like(y))
    return (y.detach().numpy(), xt.grad.numpy(), wt.grad.numpy())


@pytest.mark.parametrize("cls", [CpuTensor, TpuTensor])
@pytest.mark.parametrize("case", CT_CASES)
def test_conv_transpose_vs_torch(cls, case):
    xs, ws, stride, pad, opad, dilation, groups = case
    rng = np.random.default_rng(5)
    x = rng.normal(size=xs).astype(np.float32)
    w = rng.normal(size=ws).astype(np.float32)
    want_y, want_gx, want_gw = _torch_ct_oracle(
        x, w, stride, pad, opad, dilation, groups)

    xt = cls.from_numpy(x)
    wt = cls.from_numpy(w)
    y = xt.conv_transpose(wt, strides=stride, pad=pad, output_padding=opad,
                          dilation=dilation, groups=groups)
    np.testing.assert_allclose(y.numpy(), want_y, rtol=2e-4, atol=2e-4)
    y.sum().backward()
    np.testing.assert_allclose(xt.grad.numpy(), want_gx, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(wt.grad.numpy(), want_gw, rtol=2e-4, atol=2e-4)


def test_conv_transpose_layer():
    """nn.ConvTranspose2d upsamples and trains (autoencoder round shape)."""
    import lightgrad_tpu as light
    import lightgrad_tpu.nn as nn

    np.random.seed(0)
    up = nn.ConvTranspose2d(4, 2, kernelsize=4, stride=2, pad=1)
    x = TpuTensor.from_numpy(
        np.random.uniform(-1, 1, (2, 4, 8, 8)).astype(np.float32),
        requires_grad=False)
    y = up(x)
    assert y.shape == (2, 2, 16, 16)   # exact 2x upsampling
    tgt = TpuTensor.from_numpy(np.zeros((2, 2, 16, 16), np.float32),
                               requires_grad=False)
    optim = light.optim.Adam(up.parameters(), lr=1e-2)
    losses = []
    for _ in range(10):
        loss = light.loss.mse(up(x), tgt)
        optim.zero_grad()
        loss.backward()
        optim.step()
        losses.append(loss.item())
    assert losses[-1] < losses[0]
