"""Micro-benchmark sweep: the reference's Speed.ipynb as a script.

Reproduces the reference notebook's measurement matrix (sigmoid/relu fwd+bwd,
add/mul/matmul fwd+bwd incl. transposed operands, sum full/axis0/axis1 --
reference notebooks/Speed.ipynb cells 7-28) over size sweeps, for:

* reference CpuTensor (numpy) -- via the pyopencl stub
* our CpuTensor (numpy oracle)
* our TpuTensor on the attached chip (auto kernel mode, jit-batched to
  amortize tunnel dispatch; timings force a readback -- block_until_ready is
  a no-op through the axon tunnel)

Writes benchmarks/speed_sweep.json.  Run: python benchmarks/speed_sweep.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__) + "/..")

import numpy as np


def time_op(make_out, sync, iters=20, warmup=3):
    for _ in range(warmup):
        out = make_out()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = make_out()
    sync(out)
    return (time.perf_counter() - t0) / iters


def sweep_backend(tensor_cls, sync, sizes=(64, 128, 256, 512, 1024)):
    import lightgrad_tpu as light  # noqa: F401  (dunders installed)

    results = {}
    for n in sizes:
        np.random.seed(0)
        a = tensor_cls.from_numpy(np.random.rand(n, n).astype(np.float32))
        b = tensor_cls.from_numpy(np.random.rand(n, n).astype(np.float32))
        at = tensor_cls.from_numpy(
            np.ascontiguousarray(np.random.rand(n, n).astype(np.float32).T)
        ).transpose(1, 0)
        row = {}

        def fwd(fn):
            return time_op(fn, sync)

        def bwd(fn):
            def run():
                for t in (a, b):
                    t.zero_grad()
                y = fn()
                y.backward(allow_fill=True)
                return a.grad
            return time_op(run, sync)

        row["sigmoid_fwd"] = fwd(lambda: a.sigmoid())
        row["relu_fwd"] = fwd(lambda: a.relu())
        row["sigmoid_bwd"] = bwd(lambda: a.sigmoid())
        row["relu_bwd"] = bwd(lambda: a.relu())
        row["add_fwd"] = fwd(lambda: a + b)
        row["mul_fwd"] = fwd(lambda: a * b)
        row["mul_fwd_transposed"] = fwd(lambda: a * at)
        row["matmul_fwd"] = fwd(lambda: a @ b)
        row["matmul_fwd_transposed"] = fwd(lambda: a @ at)
        row["mul_bwd"] = bwd(lambda: a * b)
        row["matmul_bwd"] = bwd(lambda: a @ b)
        row["sum_full"] = fwd(lambda: a.sum())
        row["sum_axis0"] = fwd(lambda: a.sum(axis=0))
        row["sum_axis1"] = fwd(lambda: a.sum(axis=1))
        results[n] = {k: round(v * 1e6, 1) for k, v in row.items()}  # µs
    return results


def main():
    out = {}

    # --- reference CpuTensor --------------------------------------------
    from reference_baseline import _install_pyopencl_stub

    _install_pyopencl_stub()
    sys.path.insert(0, "/root/reference")
    import lightgrad as ref

    out["reference_cpu_us"] = sweep_backend(ref.CpuTensor, lambda o: None)
    print("reference cpu done")

    # --- our backends ----------------------------------------------------
    from lightgrad_tpu.autograd import CpuTensor, TpuTensor

    out["ours_cpu_us"] = sweep_backend(CpuTensor, lambda o: None)
    print("ours cpu done")
    out["ours_tpu_us"] = sweep_backend(
        TpuTensor, lambda o: o.numpy() if o is not None else None
    )
    import jax

    out["tpu_device"] = str(jax.devices()[0])
    print("ours tpu done")

    path = os.path.join(os.path.dirname(__file__), "speed_sweep.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("written", path)
    # quick summary at the largest size
    n = "1024"
    for op in ("sigmoid_fwd", "matmul_fwd", "matmul_bwd", "sum_full"):
        r = out["reference_cpu_us"][1024][op]
        t = out["ours_tpu_us"][1024][op]
        print(f"{op}@1024: ref {r}us vs tpu {t}us ({r / t:.1f}x)")


if __name__ == "__main__":
    main()
