"""Measure the reference implementation (ndoll1998/lightgrad) on this host.

The reference hard-imports pyopencl at package import (lightgrad/__init__ ->
autograd/__init__ -> opencl); pyopencl is not installed in this image, so a
minimal stub is injected to unlock the CPU backend (the only backend
measurable here -- no OpenCL ICD exists).  Results are written to
benchmarks/reference_cpu.json and transcribed into BASELINE.md.

Run:  python benchmarks/reference_baseline.py
"""

import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(__file__) + "/..")


def _install_pyopencl_stub():
    class _Anything:
        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            return _Anything()

        def __getattr__(self, name):
            return _Anything()

    stub = types.ModuleType("pyopencl")
    stub.__getattr__ = lambda name: _Anything()
    stub.get_platforms = lambda: []
    tools = types.ModuleType("pyopencl.tools")
    tools.__getattr__ = lambda name: _Anything()
    stub.tools = tools
    sys.modules["pyopencl"] = stub
    sys.modules["pyopencl.tools"] = tools


def synthetic_mnist(n, seed=0):
    from lightgrad_tpu.data import _synthetic_digits

    return _synthetic_digits(n, seed)


def bench_mnist_mlp(light, steps=200, batch=128):
    """Reference examples/mnist.py MLP config: 784-128-10 no-bias, AdaBelief,
    one-hot + MSE (the reference's OpenCL-compatible path, mnist.py:57-60)."""
    import lightgrad.nn as nn

    xs, ys = synthetic_mnist(steps * batch + batch)

    class NN(nn.Module):
        def __init__(self):
            nn.Module.__init__(self)
            self.l1 = nn.Linear(28 * 28, 128, bias=False)
            self.l2 = nn.Linear(128, 10, bias=False)

        def forward(self, x):
            return self.l2(self.l1(x.reshape(-1, 28 * 28)).relu())

    np.random.seed(0)
    model = NN()
    optim = light.optim.AdaBelief(model.parameters(), lr=1e-3)
    t = light.Tensor.from_numpy
    t0 = time.perf_counter()
    for i in range(steps):
        x = t(xs[i * batch : (i + 1) * batch], requires_grad=False)
        y_np = ys[i * batch : (i + 1) * batch]
        one_hot = np.zeros((batch, 10), np.float32)
        one_hot[np.arange(batch), y_np] = 1
        out = model(x)
        loss = light.loss.mse(out, t(one_hot, requires_grad=False))
        optim.zero_grad()
        loss.backward()
        optim.step()
    dt = time.perf_counter() - t0
    return dt, float(loss.item())


def bench_mnist_cnn(light, steps=200, batch=128):
    """Reference examples/mnist.py CNN config (reference mnist.py:12-22):
    Conv2d(1,8,k3,valid,no-bias) -> max_pool -> relu, Conv2d(8,16,k3,valid,
    no-bias) -> max_pool -> relu, Linear(400,10); trained with the same
    one-hot + MSE / AdaBelief protocol as the MLP row (the reference's
    OpenCL-compatible loss path, mnist.py:57-60)."""
    import lightgrad.nn as nn

    xs, ys = synthetic_mnist(steps * batch + batch)

    class CNN(nn.Module):
        def __init__(self):
            nn.Module.__init__(self)
            self.c1 = nn.Conv2d(1, 8, kernelsize=3, bias=False, pad=0)
            self.c2 = nn.Conv2d(8, 16, kernelsize=3, bias=False, pad=0)
            self.l1 = nn.Linear(5 * 5 * 16, 10)

        def forward(self, x):
            y = self.c1(x).max_pool().relu()
            y = self.c2(y).max_pool().relu()
            return self.l1(y.reshape(-1, 5 * 5 * 16))

    np.random.seed(0)
    model = CNN()
    optim = light.optim.AdaBelief(model.parameters(), lr=1e-3)
    t = light.Tensor.from_numpy
    t0 = time.perf_counter()
    for i in range(steps):
        x = t(xs[i * batch : (i + 1) * batch].reshape(batch, 1, 28, 28),
              requires_grad=False)
        y_np = ys[i * batch : (i + 1) * batch]
        one_hot = np.zeros((batch, 10), np.float32)
        one_hot[np.arange(batch), y_np] = 1
        out = model(x)
        loss = light.loss.mse(out, t(one_hot, requires_grad=False))
        optim.zero_grad()
        loss.backward()
        optim.step()
    dt = time.perf_counter() - t0
    return dt, float(loss.item())


def bench_gradient_descent(light, epochs=100):
    np.random.seed(3)
    a = light.Tensor.uniform(-1, 1, (64, 64))
    b = light.Tensor.uniform(-1, 1, (64, 64))
    c = light.Tensor.uniform(-1, 1, (64, 64))
    t0 = time.perf_counter()
    for _ in range(epochs):
        y = (a.tanh() + b.sigmoid()) @ (c.relu() - a.sigmoid())
        loss = y * y
        for p in (a, b, c):
            p.zero_grad()
        loss.backward(allow_fill=True)
        with light.no_grad():
            for p in (a, b, c):
                p += p.grad * (-0.001)
    return time.perf_counter() - t0


def bench_matmul(light, n=1024, iters=10):
    a = light.Tensor.uniform(-1, 1, (n, n))
    b = light.Tensor.uniform(-1, 1, (n, n))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = a @ b
        a.zero_grad(); b.zero_grad()
        y.backward(allow_fill=True)
    dt = (time.perf_counter() - t0) / iters
    gflops = 3 * 2 * n**3 / dt / 1e9  # fwd + two bwd GEMMs
    return dt, gflops


def bench_conv(light, iters=5):
    x = light.Tensor.uniform(-1, 1, (32, 16, 28, 28))
    w = light.Tensor.uniform(-1, 1, (32, 16, 3, 3))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = x.conv(w, strides=1)
        x.zero_grad(); w.zero_grad()
        y.backward(allow_fill=True)
    dt = (time.perf_counter() - t0) / iters
    flops = 2 * 32 * 32 * 26 * 26 * 16 * 9
    return dt, 3 * flops / dt / 1e9


def bench_bert_layer(light, iters=3):
    """One BERT-base layer fwd+bwd, batch 8 x seq 128 x hidden 768."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_bert", "/root/reference/examples/bert.py"
    )
    ref_bert = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_bert)
    cfg = dict(hidden_size=768, num_attention_heads=12, intermediate_size=3072)
    np.random.seed(0)
    layer = ref_bert.BertLayer(**cfg)
    x = light.Tensor.uniform(-1, 1, (8, 128, 768))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = layer(x)
        y = y[0] if isinstance(y, tuple) else y
        loss = y * y
        x.zero_grad()
        loss.backward(allow_fill=True)
    return (time.perf_counter() - t0) / iters


def main(repeats=3):
    """Each metric is the BEST of ``repeats`` runs -- the fastest observed
    reference time is the conservative baseline for our speedup claims."""
    _install_pyopencl_stub()
    sys.path.insert(0, "/root/reference")
    import lightgrad as light

    results = {"host": "reference CpuTensor (numpy), no OpenCL ICD available",
               "protocol": f"best of {repeats} runs per metric"}

    def best(fn, *a):
        vals = [fn(light, *a) for _ in range(repeats)]
        first = vals[0]
        if isinstance(first, tuple):
            return min(vals, key=lambda v: v[0])
        return min(vals)

    dt = best(bench_gradient_descent)
    results["gradient_descent_100epochs_s"] = round(dt, 3)
    print("gradient_descent:", dt)
    dt, loss = best(bench_mnist_mlp)
    results["mnist_mlp_200steps_s"] = round(dt, 3)
    print("mnist mlp 200 steps:", dt, "loss", loss)
    dt, loss = best(bench_mnist_cnn)
    results["mnist_cnn_200steps_s"] = round(dt, 3)
    print("mnist cnn 200 steps:", dt, "loss", loss)
    dt, gf = best(bench_matmul)
    results["matmul1024_fwdbwd_s"] = round(dt, 4)
    results["matmul1024_fwdbwd_gflops"] = round(gf, 1)
    print("matmul1024:", dt, gf, "GFLOP/s")
    dt, gf = best(bench_conv)
    results["conv2d_fwdbwd_s"] = round(dt, 4)
    results["conv2d_fwdbwd_gflops"] = round(gf, 1)
    print("conv2d:", dt, gf, "GFLOP/s")
    try:
        dt = bench_bert_layer(light)
        results["bert_layer_fwdbwd_s"] = round(dt, 3)
        print("bert layer fwd+bwd:", dt)
    except Exception as e:  # noqa: BLE001
        results["bert_layer_fwdbwd_s"] = None
        print("bert layer failed:", e)
    out = os.path.join(os.path.dirname(__file__), "reference_cpu.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("written", out)


if __name__ == "__main__":
    main()
