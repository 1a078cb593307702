"""MNIST training: MLP and CNN (parity workload: reference examples/mnist.py).

Differences from the reference: cross-entropy is used directly (our backends
support the advanced indexing it needs; the reference had to fall back to
one-hot + MSE on OpenCL, mnist.py:57-60), and the training step is compiled
into a single XLA program with ``light.jit``.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import lightgrad_tpu as light
import lightgrad_tpu.nn as nn


class CNN(nn.Module):
    def __init__(self):
        super().__init__()
        self.c1 = nn.Conv2d(1, 8, kernelsize=3, pad=1)
        self.c2 = nn.Conv2d(8, 16, kernelsize=3, pad=1)
        self.l1 = nn.Linear(7 * 7 * 16, 10)

    def forward(self, x):
        y = self.c1(x).max_pool(kernel=(2, 2)).relu()
        y = self.c2(y).max_pool(kernel=(2, 2)).relu()
        return self.l1(y.reshape(y.shape[0], -1))


class MLP(nn.Module):
    def __init__(self):
        super().__init__()
        self.l1 = nn.Linear(28 * 28, 128)
        self.l2 = nn.Linear(128, 10)

    def forward(self, x):
        return self.l2(self.l1(x).relu())


def main(model_kind="mlp", steps=200, batch=128, use_jit=True, profile=False,
         viz=False):
    mnist = light.data.MNIST(train=True, batchsize=batch)
    # device-resident pipeline: whole train set in HBM, batches are slices
    train = light.data.DeviceDataset(mnist.tensors, batchsize=batch)
    test = light.data.MNIST(train=False, n=2_000, shuffle=False, batchsize=256)

    model = MLP() if model_kind == "mlp" else CNN()
    # the CNN converges well at a higher lr (verified against a torch-CPU
    # twin of the same architecture); the MLP keeps the reference's 1e-3
    optim = light.optim.AdaBelief(
        model.parameters(), lr=1e-3 if model_kind == "mlp" else 3e-3)

    def prep(x):
        return x.reshape(x.shape[0], -1) if model_kind == "mlp" else x.reshape(
            x.shape[0], 1, 28, 28
        )

    xs_dev, ys_dev = train.tensors
    bs = batch

    def train_step(off):
        # batch slicing happens inside the compiled program (narrow op)
        x = xs_dev.narrow(off, bs)
        y = ys_dev.narrow(off, bs)
        out = model(prep(x))
        loss = light.loss.cross_entropy(out, y)
        optim.zero_grad()
        loss.backward()
        optim.step()
        return loss

    if profile and use_jit:
        # the per-op profiler observes tape dispatches; a jit-compiled step
        # is ONE fused program (profile that with jax.profiler instead)
        print("profiling runs the eager tape (per-op timings)")
        use_jit = False
    step_fn = light.jit(train_step) if use_jit else train_step

    profiler = light.Profiler() if profile else None
    done, t0, losses = 0, None, []
    while done < steps:
        for off in train.offsets():
            if done >= steps:
                break
            if profiler:
                with profiler:
                    loss = step_fn(off)
            else:
                loss = step_fn(off)
            done += 1
            if done == 3:
                # steps 1-2 are the jit record + compile phases
                loss.numpy()
                t0 = time.perf_counter()
            if done % 50 == 0:
                losses.append(loss.item())
                print(f"step {done}: loss {losses[-1]:.4f}")
    loss.numpy()
    dt = time.perf_counter() - t0
    timed = max(steps - 3, 1)
    print(f"{timed} steps in {dt:.3f}s ({timed / dt:.1f} steps/s)")
    if profiler:
        profiler.print(topn=15)

    # test accuracy
    correct = total = 0
    with light.no_grad():
        for x, y in test:
            pred = model(prep(x)).numpy().argmax(-1)
            correct += int((pred == y.numpy()).sum())
            total += len(pred)
    acc = correct / total
    print(f"test accuracy: {acc:.4f}")
    if viz and model_kind == "cnn":
        visualize_filters(model, "mnist_cnn_filters.png")
    return dt, acc


def visualize_filters(model, path):
    """Plot the first conv layer's learned filters (parity with the
    reference's filter visualization, reference examples/mnist.py:73-79)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; skipping filter visualization")
        return
    w = model.c1.w.numpy()  # (out_c, 1, k, k)
    n = w.shape[0]
    fig, axes = plt.subplots(1, n, figsize=(1.4 * n, 1.6))
    for i, ax in enumerate(np.atleast_1d(axes)):
        ax.imshow(w[i, 0], cmap="gray")
        ax.set_title(f"f{i}", fontsize=8)
        ax.axis("off")
    fig.suptitle("conv1 filters")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    print(f"filters written to {path}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="mlp", choices=["mlp", "cnn"])
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--no-jit", action="store_true")
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--viz", action="store_true",
                    help="save learned conv-filter plot (cnn only)")
    args = ap.parse_args()
    main(args.model, args.steps, args.batch, use_jit=not args.no_jit,
         profile=args.profile, viz=args.viz)
