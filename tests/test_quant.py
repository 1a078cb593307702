"""int8 post-training quantization (lightgrad_tpu/quant.py).

No reference counterpart (ndoll1998/lightgrad has no quantization); these
tests pin the serving contract: per-channel weight quantization error bounds,
drop-in QuantLinear accuracy vs the float layer, recursive module conversion,
jit compatibility, checkpoint round-trip, and the straight-through backward.
"""

import numpy as np
import pytest

import lightgrad_tpu as light
import lightgrad_tpu.nn as nn
from lightgrad_tpu.autograd import TpuTensor
from lightgrad_tpu.quant import QuantLinear, quantize_module, quantize_weight

np.random.seed(7)


def test_quantize_weight_roundtrip_error():
    w = np.random.uniform(-2, 2, (32, 64)).astype(np.float32)
    wq, ws = quantize_weight(w)
    assert wq.dtype == np.int8 and ws.shape == (32,)
    deq = wq.astype(np.float32) * ws[:, None]
    # symmetric int8: per-channel max error <= scale/2 = absmax/254
    bound = np.abs(w).max(axis=1) / 254.0 + 1e-7
    assert (np.abs(deq - w).max(axis=1) <= bound).all()


def test_quantize_weight_dead_channel():
    w = np.zeros((4, 8), np.float32)
    w[0] = np.random.uniform(-1, 1, 8)
    wq, ws = quantize_weight(w)
    assert ws[1] == 0.0 and (wq[1:] == 0).all()
    deq = wq.astype(np.float32) * ws[:, None]
    np.testing.assert_array_equal(deq[1:], 0.0)


def test_quant_linear_matches_float():
    lin = nn.Linear(64, 32)
    q = QuantLinear.from_linear(lin)
    x = TpuTensor.uniform(-1, 1, (16, 64), requires_grad=False)
    y_f = lin(x).numpy()
    y_q = q(x).numpy()
    # dynamic int8: relative error stays in the ~1% regime on uniform data
    rel = np.abs(y_q - y_f).mean() / (np.abs(y_f).mean() + 1e-9)
    assert rel < 0.02, rel
    cos = (y_f * y_q).sum() / (np.linalg.norm(y_f) * np.linalg.norm(y_q))
    assert cos > 0.999, cos


def test_quantize_module_recursive_and_threshold():
    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.body = nn.ModuleList(nn.Linear(32, 32), nn.Linear(32, 32))
            self.head = nn.Linear(32, 4)

        def forward(self, x):
            for l in self.body:
                x = l(x).relu()
            return self.head(x)

    net = Net()
    x = TpuTensor.uniform(-1, 1, (8, 32), requires_grad=False)
    y_f = net(x).numpy()
    quantize_module(net, min_features=8)  # head (min dim 4) stays float
    assert isinstance(net.body[0], QuantLinear)
    assert isinstance(net.body[1], QuantLinear)
    assert isinstance(net.head, nn.Linear)
    y_q = net(x).numpy()
    cos = (y_f * y_q).sum() / (np.linalg.norm(y_f) * np.linalg.norm(y_q))
    assert cos > 0.99, cos


def test_quant_linear_under_jit():
    lin = nn.Linear(16, 16, bias=True)
    q = QuantLinear.from_linear(lin)
    x = TpuTensor.uniform(-1, 1, (4, 16), requires_grad=False)

    fn = light.jit(lambda: q(x))
    y0 = fn().numpy()
    y1 = fn().numpy()
    np.testing.assert_array_equal(y0, y1)
    np.testing.assert_allclose(y0, q(x).numpy(), rtol=1e-5, atol=1e-6)


def test_quant_checkpoint_roundtrip():
    q1 = QuantLinear.from_linear(nn.Linear(8, 8))
    q2 = QuantLinear.from_linear(nn.Linear(8, 8))
    q2.load_parameters(q1.state_dict())
    x = TpuTensor.uniform(-1, 1, (2, 8), requires_grad=False)
    np.testing.assert_array_equal(q1(x).numpy(), q2(x).numpy())
    assert q2.weight_q.numpy().dtype == np.int8


def test_quant_backward_straight_through():
    """STE: dL/dx flows through the dequantized weight; bias gets its grad;
    the int8 weight and scales receive none."""
    lin = nn.Linear(12, 6)
    q = QuantLinear.from_linear(lin)
    x = TpuTensor.uniform(-1, 1, (5, 12))
    y = q(x)
    (y * y).sum().backward()

    assert x.grad is not None and x.grad.shape == (5, 12)
    assert q.bias.grad is not None and q.bias.grad.shape == (6,)
    assert q.weight_q.grad is None and q.weight_scale.grad is None

    # numeric check vs the dequantized-float twin
    wq, ws = q.weight_q.numpy(), q.weight_scale.numpy()
    deq = wq.astype(np.float32) * ws[:, None]
    y_np = q(x).numpy()
    gx_ref = (2 * y_np) @ deq
    np.testing.assert_allclose(x.grad.numpy(), gx_ref, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(q.bias.grad.numpy(), (2 * y_np).sum(0),
                               rtol=2e-4, atol=2e-5)


def test_quantized_model_still_learns_qat():
    """Fine-tuning a quantized net (bias-only params) reduces the loss."""
    net = nn.Module()
    net.l1 = QuantLinear.from_linear(nn.Linear(6, 16))
    net.l2 = nn.Linear(16, 3)
    x = TpuTensor.uniform(-1, 1, (32, 6), requires_grad=False)
    yt = TpuTensor.uniform(-1, 1, (32, 3), requires_grad=False)
    opt = light.optim.Adam(list(net.parameters()), lr=0.02)
    losses = []
    for _ in range(60):
        loss = light.loss.mse(net.l2(net.l1(x).relu()), yt)
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(loss.item())
    assert losses[-1] < losses[0] * 0.7, losses[::10]
