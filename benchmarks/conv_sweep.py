"""Pallas(implicit-GEMM)-vs-XLA conv sweep at ResNet shapes (VERDICT r3 #6).

Measures fwd and fwd+bwd for the ResNet block shapes (basic 3x3 stages,
stride-2 transitions, the ImageNet stem) in f32 and bf16, both conv
implementations (ops/conv.py), chained in-program so the tunnel's ~1-2 ms
dispatch floor amortizes below 2%.  Writes
``lightgrad_tpu/ops/conv_policy.json``: per shape key the measured winner
(pallas only when >5% faster than XLA), plus a per-dtype default -- the
table ``ops/conv.py::_route`` resolves 'auto' against, exactly the way
gemm_policy.json routes the GEMM.

Run: ``timeout 1800 python benchmarks/conv_sweep.py`` (holds the TPU).
"""

import json
import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import lightgrad_tpu  # noqa: F401  (cache setup)
from lightgrad_tpu.ops.conv import _conv_fwd_impl, _conv_bwd_impl

V5E_BF16_PEAK = 197e12  # one v5e chip, bf16 (394 is int8)

# (batch, cin, spatial, cout, k, stride) -- ResNet-18/50 stage shapes + the
# CIFAR ResNet-20 stem; VALID padding (the framework's conv contract), so
# spatial here is the padded input size that yields the stage's output
SHAPES = [
    (32, 64, 58, 64, 3, 1),     # conv2_x body: 56^2 out
    (32, 128, 30, 128, 3, 1),   # conv3_x body: 28^2 out
    (32, 256, 16, 256, 3, 1),   # conv4_x body: 14^2 out
    (32, 512, 9, 512, 3, 1),    # conv5_x body: 7^2 out
    (32, 64, 57, 128, 3, 2),    # stride-2 transition: 28^2 out
    (32, 3, 230, 64, 7, 2),     # ImageNet stem: 112^2 out
    (128, 16, 34, 16, 3, 1),    # CIFAR ResNet-20 body: 32^2 out
]


def conv_flops(b, cin, s, cout, k, st):
    out = (s - k) // st + 1
    return 2 * b * cout * out * out * cin * k * k, out


def time_median(fn, iters, repeats=5):
    fn()  # compile
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        out = fn()
        np.asarray(out)  # real readback: block_until_ready lies via axon
        ts.append((time.time() - t0) / iters)
    return sorted(ts)[len(ts) // 2], [round(t, 6) for t in sorted(ts)]


def make_prog(b, cin, s, cout, k, st, mode, dt, chain, with_bwd):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (b, cin, s, s)), dt)
    w = jnp.asarray(rng.uniform(-0.1, 0.1, (cout, cin, k, k)), dt)

    @jax.jit
    def prog(x, w):
        acc = jnp.zeros((), jnp.float32)
        for i in range(chain):
            xi = x + jnp.asarray(i, dt) * jnp.asarray(1e-6, dt)
            y = _conv_fwd_impl(xi, w, st, 1, 1, mode)
            acc = acc + y.mean().astype(jnp.float32)
            if with_bwd:
                g = jnp.full(y.shape, 1e-3, dt)
                gx, gw = _conv_bwd_impl(g, xi, w, st, 1, 1, mode)
                acc = acc + gx.mean().astype(jnp.float32) \
                    + gw.mean().astype(jnp.float32)
        return acc

    return lambda: prog(x, w)


def main():
    assert jax.default_backend() == "tpu", "sweep must run on the TPU"
    results = {"device": str(jax.devices()[0]),
               "protocol": "median of 5, chained in-program",
               "entries": []}
    routes, wins = {}, {"f32": 0, "bf16": 0}
    counts = {"f32": 0, "bf16": 0}

    for tag, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        for (b, cin, s, cout, k, st) in SHAPES:
            flops, out = conv_flops(b, cin, s, cout, k, st)
            chain = max(2, min(12, int(3e11 / (3 * flops))))
            row = {"tag": tag, "shape": [b, cin, s, cout, k, st],
                   "out": out, "gflop_fwd": round(flops / 1e9, 2)}
            for mode in ("xla", "pallas"):
                try:
                    dtm, vals = time_median(
                        make_prog(b, cin, s, cout, k, st, mode, dt,
                                  chain, True), chain)
                    row[f"{mode}_fwdbwd_ms"] = round(dtm * 1e3, 4)
                    row[f"{mode}_mfu"] = round(
                        3 * flops / dtm / V5E_BF16_PEAK, 4)
                    row[f"{mode}_regions"] = vals
                except Exception as e:  # Mosaic shape rejections etc.
                    row[f"{mode}_error"] = repr(e)[:200]
            results["entries"].append(row)
            xm = row.get("xla_fwdbwd_ms")
            pm = row.get("pallas_fwdbwd_ms")
            key = f"{tag}:c{cin}>{cout}k{k}s{st}"
            if xm and pm:
                winner = "pallas" if pm < 0.95 * xm else "xla"
            else:
                winner = "xla" if xm else "pallas"
            routes[key] = winner
            counts[tag] += 1
            wins[tag] += winner == "pallas"
            print(f"{key}: xla {xm} ms, pallas {pm} ms -> {winner}",
                  flush=True)

    default = {t: ("pallas" if wins[t] > counts[t] / 2 else "xla")
               for t in ("f32", "bf16")}
    policy = {"written_by": "benchmarks/conv_sweep.py",
              "device": results["device"],
              "default": default, "routes": routes,
              "measurements": results["entries"]}
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "lightgrad_tpu", "ops",
        "conv_policy.json")
    with open(out_path, "w") as f:
        json.dump(policy, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
