"""Benchmark harness: prints ONE JSON line on stdout.

Headline metric: MNIST MLP 200-step training wall-clock (the reference's
examples/mnist.py config: 784-128-10 no-bias MLP, batch 128, AdaBelief,
one-hot + MSE) on one TPU chip with the jit step-compiler, versus the
reference implementation's CPU backend measured on this host
(benchmarks/reference_cpu.json; its OpenCL backend needs an ICD this image
lacks).  ``vs_baseline`` is the speedup factor (reference_seconds / ours).

Detailed sub-benchmarks (gradient-descent loop, matmul/conv GFLOP/s, BERT
layer fwd+bwd) go to stderr and benchmarks/tpu_results.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import lightgrad_tpu as light
import lightgrad_tpu.nn as nn
from lightgrad_tpu.autograd import TpuTensor

err = lambda *a: print(*a, file=sys.stderr, flush=True)


def bench_mnist_mlp(steps=200, batch=128):
    from lightgrad_tpu.data import _synthetic_digits

    xs, ys = _synthetic_digits(steps * batch + batch)

    class NN(nn.Module):
        def __init__(self):
            super().__init__()
            self.l1 = nn.Linear(28 * 28, 128, bias=False)
            self.l2 = nn.Linear(128, 10, bias=False)

        def forward(self, x):
            return self.l2(self.l1(x.reshape(-1, 28 * 28)).relu())

    np.random.seed(0)
    model = NN()
    optim = light.optim.AdaBelief(model.parameters(), lr=1e-3)

    # device-resident data pipeline: upload the epoch once, slice in HBM with
    # a *traced* batch offset (narrow op) -- the TPU-idiomatic equivalent of
    # the reference's in-memory numpy arrays; per-step host traffic is 4 bytes
    oh_all = np.zeros((len(ys), 10), np.float32)
    oh_all[np.arange(len(ys)), ys] = 1
    xs_dev = TpuTensor.from_numpy(xs.reshape(len(xs), -1), requires_grad=False)
    oh_dev = TpuTensor.from_numpy(oh_all, requires_grad=False)

    def step(off):
        x = xs_dev.narrow(off, batch)
        y1h = oh_dev.narrow(off, batch)
        loss = light.loss.mse(model(x), y1h)
        optim.zero_grad()
        loss.backward()
        optim.step()
        return loss

    fn = light.jit(step)
    offs = [
        TpuTensor.from_numpy(np.int32(i * batch), requires_grad=False)
        for i in range(steps)
    ]
    for i in range(3):
        loss = fn(offs[i])
    loss.numpy()
    # best-of-3: the shared chip has large run-to-run variance
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(steps):
            loss = fn(offs[i])
        loss.numpy()
        best = min(best, time.perf_counter() - t0)
    return best, float(loss.item())


def bench_gradient_descent(epochs=100):
    np.random.seed(3)
    a = light.uniform(-1, 1, (64, 64))
    b = light.uniform(-1, 1, (64, 64))
    c = light.uniform(-1, 1, (64, 64))

    def epoch():
        y = (a.tanh() + b.sigmoid()) @ (c.relu() - a.sigmoid())
        loss = y * y
        for p in (a, b, c):
            p.zero_grad()
        loss.backward(allow_fill=True)
        with light.no_grad():
            for p in (a, b, c):
                p += p.grad * (-0.001)
        return loss

    fn = light.jit(epoch)
    for _ in range(3):
        loss = fn()
    loss.numpy()
    t0 = time.perf_counter()
    for _ in range(epochs):
        loss = fn()
    loss.numpy()
    return time.perf_counter() - t0


def bench_matmul(n=1024, iters=50):
    np.random.seed(1)
    a = light.uniform(-1, 1, (n, n))
    b = light.uniform(-1, 1, (n, n))

    def fwd_bwd():
        y = a @ b
        a.zero_grad()
        b.zero_grad()
        y.backward(allow_fill=True)
        return y

    fn = light.jit(fwd_bwd)
    for _ in range(3):
        y = fn()
    y.numpy()
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn()
    y.numpy()
    dt = (time.perf_counter() - t0) / iters
    return dt, 3 * 2 * n**3 / dt / 1e9


def bench_conv(iters=20):
    np.random.seed(1)
    x = light.uniform(-1, 1, (32, 16, 28, 28))
    w = light.uniform(-1, 1, (32, 16, 3, 3))

    def fwd_bwd():
        y = x.conv(w, strides=1)
        x.zero_grad()
        w.zero_grad()
        y.backward(allow_fill=True)
        return y

    fn = light.jit(fwd_bwd)
    for _ in range(3):
        y = fn()
    y.numpy()
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn()
    y.numpy()
    dt = (time.perf_counter() - t0) / iters
    flops = 2 * 32 * 32 * 26 * 26 * 16 * 9
    return dt, 3 * flops / dt / 1e9


def bench_bert_layer(iters=20, batch=8, seq=128):
    from lightgrad_tpu.models.bert import BertConfig, BertLayer

    np.random.seed(0)
    cfg = BertConfig()
    layer = BertLayer(cfg)
    x = light.uniform(-1, 1, (batch, seq, cfg.hidden_size))

    def fwd_bwd():
        y = layer(x)
        loss = y * y
        x.zero_grad()
        loss.backward(allow_fill=True)
        return loss

    fn = light.jit(fwd_bwd)
    for _ in range(3):
        loss = fn()
    loss.numpy()
    t0 = time.perf_counter()
    for _ in range(iters):
        loss = fn()
    loss.numpy()
    return (time.perf_counter() - t0) / iters


def bench_attention_long(iters=10, bh=96, s=2048, d=64):
    """Fused flash attention fwd+bwd at long sequence (auto mode routes to
    the Pallas kernels here; the materialized path OOMs at s=4096)."""
    np.random.seed(0)
    q = light.uniform(-1, 1, (bh, s, d))
    k = light.uniform(-1, 1, (bh, s, d))
    v = light.uniform(-1, 1, (bh, s, d))
    scale = 1.0 / np.sqrt(d)

    def fwd_bwd():
        y = q.attention(k, v, scale=scale)
        loss = y * y
        q.zero_grad()
        k.zero_grad()
        v.zero_grad()
        loss.backward(allow_fill=True)
        return loss

    fn = light.jit(fwd_bwd)
    for _ in range(3):
        y = fn()
    y.numpy()
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn()
    y.numpy()
    dt = (time.perf_counter() - t0) / iters
    flops = 4 * bh * s * s * d * 3.5  # fwd + ~2.5x bwd
    return dt, flops / dt / 1e9


def main():
    import jax

    details = {
        "device": str(jax.devices()[0]),
        "kernel_mode": __import__("lightgrad_tpu.ops.runtime", fromlist=["kernel_mode"]).kernel_mode(),
    }
    err(f"device: {details['device']}, kernels: {details['kernel_mode']}")

    dt = bench_gradient_descent()
    details["gradient_descent_100epochs_s"] = round(dt, 4)
    err(f"gradient_descent 100 epochs: {dt:.4f}s")

    mnist_s, final_loss = bench_mnist_mlp()
    details["mnist_mlp_200steps_s"] = round(mnist_s, 4)
    details["mnist_final_loss"] = round(final_loss, 4)
    err(f"mnist mlp 200 steps: {mnist_s:.4f}s (loss {final_loss:.4f})")

    dt, gf = bench_matmul()
    details["matmul1024_fwdbwd_s"] = round(dt, 6)
    details["matmul1024_fwdbwd_gflops"] = round(gf, 1)
    err(f"matmul 1024^2 fwd+bwd: {dt * 1e3:.3f}ms = {gf:.0f} GFLOP/s")

    dt, gf = bench_conv()
    details["conv2d_fwdbwd_s"] = round(dt, 6)
    details["conv2d_fwdbwd_gflops"] = round(gf, 1)
    err(f"conv2d fwd+bwd: {dt * 1e3:.3f}ms = {gf:.0f} GFLOP/s")

    dt = bench_bert_layer()
    details["bert_layer_fwdbwd_s"] = round(dt, 5)
    err(f"BERT-base layer fwd+bwd (8x128): {dt * 1e3:.2f}ms")

    dt, gf = bench_attention_long()
    details["flash_attention_s2048_fwdbwd_s"] = round(dt, 5)
    details["flash_attention_s2048_gflops"] = round(gf, 1)
    err(f"flash attention fwd+bwd (96x2048x64): {dt * 1e3:.2f}ms = {gf:.0f} GFLOP/s")

    # baseline: reference CPU measured on this host
    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", "reference_cpu.json")
    vs = None
    if os.path.exists(ref_path):
        ref = json.load(open(ref_path))
        details["reference_cpu"] = ref
        if ref.get("mnist_mlp_200steps_s"):
            vs = round(ref["mnist_mlp_200steps_s"] / mnist_s, 2)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", "tpu_results.json")
    with open(out_path, "w") as f:
        json.dump(details, f, indent=2)

    print(json.dumps({
        "metric": "mnist_mlp_200steps_wallclock",
        "value": round(mnist_s, 4),
        "unit": "s",
        "vs_baseline": vs if vs is not None else 0.0,
    }))


if __name__ == "__main__":
    main()
