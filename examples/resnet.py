"""ResNet training / pretrained-checkpoint inference.

Vision-model-family example beyond the reference's 3-layer MNIST CNN
(reference examples/mnist.py:12-22): trains a CIFAR-style ResNet-20 (He et
al.) on MNIST with BatchNorm running stats, residual projections and global
average pooling, all inside one compiled train step.  With network access,
``--pretrained`` instead loads the torchvision ResNet-18 checkpoint through
the dependency-free torch reader and runs inference.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import lightgrad_tpu as light
import lightgrad_tpu.nn as nn
from lightgrad_tpu.models.resnet import (resnet18, resnet20,
                                         load_torchvision_state_dict)


def train(steps=150, batch=128, amp=False):
    mnist = light.data.MNIST(train=True, batchsize=batch)
    train_set = light.data.DeviceDataset(mnist.tensors, batchsize=batch)
    test = light.data.MNIST(train=False, n=2_000, shuffle=False, batchsize=256)

    np.random.seed(0)
    model = resnet20(num_classes=10, in_channels=1)
    n_params = sum(p.numel() for p in model.parameters())
    print(f"ResNet-20: {n_params/1e3:.0f}k params")

    if amp:
        mp = light.amp.MixedPrecision(
            model, lambda ps: light.optim.AdamW(ps, lr=3e-3, weight_decay=0.01))
    else:
        optim = light.optim.AdamW(model.parameters(), lr=3e-3, weight_decay=0.01)

    xs_dev, ys_dev = train_set.tensors

    def train_step(off):
        x = xs_dev.narrow(off, batch).reshape(batch, 1, 28, 28)
        y = ys_dev.narrow(off, batch)
        loss = light.loss.cross_entropy(model(x), y)
        if amp:
            mp.zero_grad(); loss.backward(); mp.step()
        else:
            optim.zero_grad(); loss.backward(); optim.step()
        return loss

    step_fn = light.jit(train_step)
    done, t0 = 0, None
    while done < steps:
        for off in train_set.offsets():
            if done >= steps:
                break
            loss = step_fn(off)
            done += 1
            if done == 3:  # steps 1-2 are record + compile
                loss.numpy()
                t0 = time.perf_counter()
            if done % 25 == 0:
                print(f"step {done}: loss {loss.item():.4f}")
    loss.numpy()
    dt = time.perf_counter() - t0
    timed = max(steps - 3, 1)
    print(f"{timed} steps in {dt:.3f}s ({timed / dt:.1f} steps/s)")

    model.eval()  # BatchNorm switches to running stats
    correct = total = 0
    with light.no_grad():
        for x, y in test:
            x = x.reshape(x.shape[0], 1, 28, 28)
            pred = model(x).numpy().argmax(-1)
            correct += int((pred == y.numpy()).sum())
            total += len(pred)
    print(f"test accuracy: {correct / total:.4f}")


def pretrained_inference():
    """Load torchvision ResNet-18 ImageNet weights and classify a synthetic
    batch (sanity: logits finite, deterministic top-1)."""
    from lightgrad_tpu.utils import fetch, load_torch_state_dict

    url = "https://download.pytorch.org/models/resnet18-f37072fd.pth"
    try:
        state = load_torch_state_dict(fetch(url))
    except Exception as e:  # offline image: report and bail gracefully
        print(f"could not fetch torchvision checkpoint ({e}); "
              "run with network access for pretrained inference")
        return
    model = resnet18()
    load_torchvision_state_dict(model, state)
    model.eval()
    rng = np.random.default_rng(0)
    x = light.Tensor.from_numpy(
        rng.standard_normal((2, 3, 224, 224)).astype(np.float32),
        requires_grad=False)
    with light.no_grad():
        logits = model(x).numpy()
    print(f"logits: shape {logits.shape}, top-1 {logits.argmax(-1)}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--amp", action="store_true", help="bf16 master-weight AMP")
    ap.add_argument("--pretrained", action="store_true",
                    help="torchvision ResNet-18 inference instead of training")
    args = ap.parse_args()
    if args.pretrained:
        pretrained_inference()
    else:
        train(args.steps, args.batch, amp=args.amp)
