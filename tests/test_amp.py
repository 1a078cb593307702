"""Master-weight AMP: bf16 compute + f32 masters + loss scaling.

The reference trains hard-f32 only (lightgrad/autograd/cpu/tensor.py:6);
this is the beats-the-reference precision axis (VERDICT r1 #2)."""

import numpy as np
import jax.numpy as jnp

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


def _amp_batch(mp, x, y):
    xb = x.astype(mp.compute_dtype).detach()._set_requires_grad(False)
    yb = y.astype(mp.compute_dtype).detach()._set_requires_grad(False)
    return xb, yb


def test_mixed_precision_trains():
    np.random.seed(0)
    model = TwoLayer()
    mp = amp.MixedPrecision(model, lambda ps: light.optim.Adam(ps, lr=1e-2))
    assert all(p.dtype == jnp.bfloat16 for p in model.parameters())
    assert all(m.dtype == jnp.float32 for m in mp.masters)
    x, y = _data()
    xb, yb = _amp_batch(mp, x, y)
    losses = []
    for _ in range(60):
        loss = light.loss.mse(model(xb), yb)
        mp.zero_grad()
        mp.scale(loss).backward()
        mp.step()
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0] * 0.5, losses[::20]
    # compute params track masters exactly (re-quantized each step)
    for p, m in zip(mp.compute_params, mp.masters):
        np.testing.assert_array_equal(
            p.numpy().astype(np.float32),
            m.numpy().astype(jnp.bfloat16).astype(np.float32))


class OneParam(light.nn.Module):
    def __init__(self):
        super().__init__()
        self.w = light.Tensor.ones((4,))

    def forward(self, x):
        return (self.w * x).sum()


def test_mixed_precision_beats_plain_bf16():
    """Master weights accumulate updates plain bf16 rounds away entirely.

    At w=1.0 the bf16 spacing below is 2^-9; an SGD delta of 1e-4 rounds
    back to 1.0 EVERY step in pure bf16 (permanent stall), while the f32
    master keeps integrating and eventually crosses a representable bf16
    value."""
    x = TpuTensor.from_numpy(np.ones(4, np.float32), requires_grad=False)
    xb = x.astype(jnp.bfloat16).detach()._set_requires_grad(False)

    plain = OneParam()
    amp.cast_module(plain, jnp.bfloat16)
    opt = light.optim.SGD(plain.parameters(), lr=1e-4)
    for _ in range(100):
        loss = plain(xb)  # grad dL/dw = x = 1
        opt.zero_grad(); loss.backward(); opt.step()
    np.testing.assert_array_equal(
        plain.w.numpy().astype(np.float32), np.ones(4, np.float32)), "stall expected"

    master = OneParam()
    mp = amp.MixedPrecision(master, lambda ps: light.optim.SGD(ps, lr=1e-4))
    for _ in range(100):
        loss = master(xb)
        mp.zero_grad(); loss.backward(); mp.step()
    # master integrated 100 * 1e-4 = 0.01 exactly
    np.testing.assert_allclose(mp.masters[0].numpy(), 0.99, rtol=1e-5)
    assert (master.w.numpy().astype(np.float32) < 1.0).all(), (
        "AMP compute weights must have moved")


def test_grad_scaler_skips_nonfinite_steps():
    np.random.seed(3)
    model = TwoLayer()
    scaler = amp.GradScaler(init_scale=8.0, growth_interval=3)
    mp = amp.MixedPrecision(model, lambda ps: light.optim.Adam(ps, lr=1e-2),
                            scaler=scaler)
    x, y = _data(seed=3)
    xb, yb = _amp_batch(mp, x, y)
    before = [m.numpy().copy() for m in mp.masters]

    # poison the gradients with an inf and step: params must NOT move
    loss = light.loss.mse(model(xb), yb)
    mp.zero_grad()
    mp.scale(loss).backward()
    g = mp.compute_params[0].grad
    bad = np.array(g.numpy(), np.float32)  # writable copy
    bad[0, 0] = np.inf
    g._set_data(jnp.asarray(bad, dtype=g.dtype))
    mp.step()
    for m, b in zip(mp.masters, before):
        np.testing.assert_array_equal(m.numpy(), b)
    assert scaler.scale_value() == 4.0  # backoff 0.5

    # clean steps apply and eventually grow the scale
    for _ in range(4):
        loss = light.loss.mse(model(xb), yb)
        mp.zero_grad()
        mp.scale(loss).backward()
        mp.step()
    assert scaler.scale_value() == 8.0  # grew once after 3 good steps
    assert not np.array_equal(mp.masters[0].numpy(), before[0])


def test_mixed_precision_under_jit():
    """The whole AMP step (scaler included) compiles into one program."""
    np.random.seed(4)
    model = TwoLayer()
    mp = amp.MixedPrecision(model, lambda ps: light.optim.Adam(ps, lr=1e-2),
                            scaler=amp.GradScaler(init_scale=4.0))
    x, y = _data(seed=4)
    xb, yb = _amp_batch(mp, x, y)

    def train_step(a, b):
        loss = light.loss.mse(model(a), b)
        mp.zero_grad()
        mp.scale(loss).backward()
        mp.step()
        return loss

    step = light.jit(train_step)
    losses = [float(step(xb, yb).item()) for _ in range(12)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses
    # recorded+compiled path keeps dtypes straight
    assert all(p.dtype == jnp.bfloat16 for p in mp.compute_params)
    assert all(m.dtype == jnp.float32 for m in mp.masters)


def test_amp_conv_and_linear_accept_f32_inputs():
    """Autocast boundary (measured r5: ResNet-20 AMP train crashed --
    lax.conv_general_dilated requires equal dtypes -- when raw f32 images
    hit a bf16-cast stem): bf16-cast Conv2d/Linear fed f32 inputs cast
    the input to the weight dtype on the tape; gradients flow back f32."""
    import numpy as np
    import jax.numpy as jnp
    import lightgrad_tpu as light
    from lightgrad_tpu import nn
    from lightgrad_tpu.autograd import TpuTensor

    np.random.seed(0)
    net = nn.Sequential(nn.Conv2d(1, 4, 3), nn.ReLU(), nn.Flatten(),
                        nn.Linear(4 * 8 * 8, 3))
    light.amp.cast_module(net, jnp.bfloat16)
    x = TpuTensor.from_numpy(
        np.random.uniform(-1, 1, (2, 1, 8, 8)).astype(np.float32))
    y = net(x)
    assert str(y.dtype) == "bfloat16"
    y.sum().backward()
    assert str(x.grad.dtype) == "float32"
