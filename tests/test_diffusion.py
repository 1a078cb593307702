"""DDPM family (models/diffusion.py): UNet shapes, schedule math vs numpy,
compiled training convergence, and the ancestral sampler."""

import numpy as np

import lightgrad_tpu as light
from lightgrad_tpu.autograd import TpuTensor
from lightgrad_tpu.models import UNet, Diffusion


def _tiny():
    np.random.seed(0)
    unet = UNet(base=8, time_dim=32)
    return unet, Diffusion(unet, timesteps=10)


def test_unet_output_shape_matches_input():
    unet, _ = _tiny()
    rng = np.random.default_rng(0)
    x = TpuTensor.from_numpy(rng.normal(size=(2, 1, 28, 28)).astype(np.float32),
                             requires_grad=False)
    t = TpuTensor.from_numpy(np.array([1.0, 5.0], np.float32),
                             requires_grad=False)
    y = unet(x, t)
    assert y.shape == (2, 1, 28, 28)
    assert np.isfinite(y.numpy()).all()


def test_q_sample_matches_numpy_closed_form():
    _, dif = _tiny()
    rng = np.random.default_rng(1)
    x0 = rng.normal(size=(3, 1, 28, 28)).astype(np.float32)
    z = rng.normal(size=(3, 1, 28, 28)).astype(np.float32)
    t = np.array([0, 4, 9], np.int32)

    got = dif.q_sample(
        TpuTensor.from_numpy(x0, requires_grad=False),
        TpuTensor.from_numpy(t, requires_grad=False),
        TpuTensor.from_numpy(z, requires_grad=False)).numpy()

    betas = np.linspace(1e-4, 0.02, 10, dtype=np.float32)
    a_bar = np.cumprod(1.0 - betas)
    want = (x0 * np.sqrt(a_bar[t])[:, None, None, None]
            + z * np.sqrt(1.0 - a_bar[t])[:, None, None, None])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_compiled_training_step_decreases_loss():
    unet, dif = _tiny()
    optim = light.optim.Adam(unet.parameters(), lr=1e-3)
    rng = np.random.default_rng(0)
    x0 = TpuTensor.from_numpy(
        rng.normal(size=(2, 1, 28, 28)).astype(np.float32),
        requires_grad=False)
    t = TpuTensor.from_numpy(np.array([3, 7], np.int32), requires_grad=False)
    z = TpuTensor.from_numpy(
        rng.normal(size=(2, 1, 28, 28)).astype(np.float32),
        requires_grad=False)

    def step():
        loss = dif.loss(x0, t, z)
        optim.zero_grad()
        loss.backward()
        optim.step()
        return loss

    fn = light.jit(step)
    losses = [float(fn().item()) for _ in range(8)]
    assert losses[-1] < losses[0], losses


def test_sampler_produces_finite_images():
    _, dif = _tiny()
    imgs = dif.sample(2, seed=1, jit=light.jit).numpy()
    assert imgs.shape == (2, 1, 28, 28)
    assert np.isfinite(imgs).all()


def test_traced_rng_fresh_per_compiled_call():
    """randn_like/randint_like draw FRESH values on every call of a compiled
    step (the recorder threads the mutated RNG key through the program, same
    contract as dropout)."""
    light.random.seed(7)
    base = TpuTensor.from_numpy(np.zeros((64,), np.float32),
                                requires_grad=False)

    def draw():
        return base.randn_like(), base.randint_like(0, 1000)

    fn = light.jit(draw)
    z1, t1 = fn()
    z2, t2 = fn()
    assert not np.allclose(z1.numpy(), z2.numpy())
    assert not np.array_equal(t1.numpy(), t2.numpy())
    assert np.std(z1.numpy()) > 0.5  # actually normal-ish, not zeros
    assert t1.numpy().min() >= 0 and t1.numpy().max() < 1000


def test_ddim_deterministic_and_finite():
    """eta=0 DDIM is deterministic: same seed => identical samples; the
    10-hop sub-schedule produces finite images."""
    _, dif = _tiny()
    a = dif.sample_ddim(2, steps=5, eta=0.0, seed=3, jit=light.jit).numpy()
    b = dif.sample_ddim(2, steps=5, eta=0.0, seed=3, jit=light.jit).numpy()
    assert a.shape == (2, 1, 28, 28)
    assert np.isfinite(a).all()
    np.testing.assert_allclose(a, b)


def test_ddim_full_schedule_eta1_matches_ancestral_marginals():
    """With steps=T and eta=1, one DDIM hop equals the DDPM posterior: the
    per-hop mean/std coefficients agree with p_sample's closed form."""
    _, dif = _tiny()
    rng = np.random.default_rng(0)
    xt = TpuTensor.from_numpy(rng.normal(size=(2, 1, 28, 28)).astype(np.float32),
                              requires_grad=False)
    z = TpuTensor.from_numpy(rng.normal(size=(2, 1, 28, 28)).astype(np.float32),
                             requires_grad=False)
    t = TpuTensor.from_numpy(np.array([5, 5], np.int32), requires_grad=False)
    tp = TpuTensor.from_numpy(np.array([4, 4], np.int32), requires_grad=False)
    got = dif.p_sample_ddim(xt, t, tp, 1.0, z).numpy()
    want = dif.p_sample(xt, t, z).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
