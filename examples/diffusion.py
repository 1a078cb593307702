"""DDPM on MNIST-class digits: train a time-conditioned UNet to denoise,
then draw samples by ancestral sampling.

A generative workload the reference framework cannot run at all (conv has no
backward there, reference lightgrad/opencl/ops.py:403-408).  The whole
noise-prediction step -- forward diffusion, UNet, MSE, Adam -- compiles into
ONE XLA program; the sampler reuses a single compiled reverse-step program
for all T timesteps because the timestep enters as a traced tensor.

Usage: python examples/diffusion.py [--steps 400] [--batch 64] [--viz]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import lightgrad_tpu as light
from lightgrad_tpu.autograd import TpuTensor
from lightgrad_tpu.models import UNet, Diffusion


def main(steps=400, batch=64, timesteps=200, base=32, lr=2e-4, viz=False,
         seed=0, ema_decay=0.995):
    mnist = light.data.MNIST(train=True, n=20_000, shuffle=False)
    train_x = mnist.tensors[0].numpy().astype(np.float32)  # (n, 28, 28) in [0,1]
    data = train_x.reshape(-1, 1, 28, 28) * 2.0 - 1.0      # [-1, 1]

    np.random.seed(seed)
    unet = UNet(in_channels=1, base=base)
    dif = Diffusion(unet, timesteps=timesteps)
    optim = light.optim.Adam(unet.parameters(), lr=lr)
    n_params = sum(p.numel() for p in unet.parameters())
    print(f"UNet {n_params/1e3:.0f}k params, T={timesteps}")

    # device-resident pipeline: the image pool lives in HBM (shuffled once);
    # each step slices its batch at a traced offset and draws timesteps +
    # noise ON DEVICE (randint_like/randn_like thread the traced RNG key),
    # so per-step host traffic is one 4-byte offset
    rng = np.random.default_rng(seed)
    rng.shuffle(data)
    light.random.seed(seed)
    data_dev = TpuTensor.from_numpy(data, requires_grad=False)
    ti = TpuTensor.from_numpy(np.zeros(batch, np.int32), requires_grad=False)

    ema = light.optim.EMA(unet.parameters(), decay=ema_decay) \
        if ema_decay else None

    def step(off):
        x0 = data_dev.narrow(off, batch)
        t = ti.randint_like(0, timesteps)
        z = x0.randn_like()
        loss = dif.loss(x0, t, z)
        optim.zero_grad()
        loss.backward()
        optim.step()
        if ema is not None:  # shadow update fuses into the same program
            ema.update()
        return loss

    fn = light.jit(step)
    n_off = (len(data) - batch) // batch
    offs = [TpuTensor.from_numpy(np.int32((i % n_off) * batch),
                                 requires_grad=False) for i in range(steps)]
    fn(offs[0])  # compile
    t0 = time.time()
    for i in range(1, steps + 1):
        loss = fn(offs[i - 1])
        if i % 50 == 0 or i == 1:
            print(f"step {i}: loss {float(loss.item()):.4f}", flush=True)
    dt = time.time() - t0
    print(f"{steps} steps in {dt:.1f}s ({steps/dt:.1f} steps/s)")

    print("sampling 16 digits" + (" (EMA weights)" if ema else "") + "...")
    t0 = time.time()
    if ema is not None:
        with ema.average_parameters():
            imgs = dif.sample(16, seed=seed + 1, jit=light.jit).numpy()
    else:
        imgs = dif.sample(16, seed=seed + 1, jit=light.jit).numpy()
    print(f"sampled in {time.time()-t0:.1f}s, "
          f"range [{imgs.min():.2f}, {imgs.max():.2f}]")

    if viz:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            print("matplotlib unavailable; skipping sample grid")
            return
        fig, axes = plt.subplots(4, 4, figsize=(6, 6))
        for ax, im in zip(axes.ravel(), imgs):
            ax.imshow(np.clip((im[0] + 1) / 2, 0, 1), cmap="gray")
            ax.axis("off")
        path = "diffusion_samples.png"
        fig.savefig(path, dpi=120, bbox_inches="tight")
        print(f"wrote {path}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--timesteps", type=int, default=200)
    ap.add_argument("--base", type=int, default=32)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--viz", action="store_true")
    ap.add_argument("--ema", type=float, default=0.995,
                    help="EMA decay for sampling weights (0 disables)")
    args = ap.parse_args()
    main(steps=args.steps, batch=args.batch, timesteps=args.timesteps,
         base=args.base, lr=args.lr, viz=args.viz, ema_decay=args.ema)
