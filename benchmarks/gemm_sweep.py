"""Pallas-vs-XLA GEMM sweep on the attached TPU (VERDICT r1 #3).

Measures square matmuls 512..4096 for three precision configs
(f32 'highest', f32 'default', bf16) across XLA and Pallas block variants,
median-of-5 protocol, and writes ``benchmarks/gemm_sweep.json`` containing
both the raw table (with MFU vs the v5e bf16 peak) and the routing policy
``resolve_mode('auto')`` consults: per (precision, size), 'pallas' only
where the measured Pallas kernel beats XLA by >5%, else 'xla'.

Run: ``python benchmarks/gemm_sweep.py`` (holds the TPU exclusively).
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.bench_util import time_median
from lightgrad_tpu.ops import matmul as mm

V5E_BF16_PEAK = 197e12

SIZES = [512, 1024, 2048, 4096]
# block variants tried per dtype; >= (512,512,1024) crashes the tunneled
# remote compiler (axon quirk), so the search stays below that
PALLAS_BLOCKS = {
    "f32_highest": [(256, 256, 512), (512, 512, 512), (128, 256, 512)],
    "f32_default": [(256, 256, 512), (512, 512, 512), (128, 256, 512)],
    "bf16": [(256, 256, 512), (512, 512, 512), (256, 512, 512)],
}


def _mk_inputs(n, tag):
    dt = jnp.bfloat16 if tag == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(-1, 1, (1, n, n)), dtype=dt)
    b = jnp.asarray(rng.uniform(-1, 1, (1, n, n)), dtype=dt)
    return a, b


def main():
    assert jax.default_backend() == "tpu", "sweep must run on the TPU"
    results = {"device": str(jax.devices()[0]), "protocol": "median of 5 x 20 iters",
               "entries": []}
    policy = {}

    for tag in ("f32_highest", "f32_default", "bf16"):
        mm.set_precision("default" if tag == "f32_default" else "highest")
        for n in SIZES:
            a, b = _mk_inputs(n, tag)
            flops = 2 * n ** 3
            # >=20 amortized iters: the ~2.5ms tunnel dispatch otherwise
            # dominates single-digit-ms kernels and under-reports TF/s
            iters = max(20, min(50, int(2e11 / flops)))

            # bf16 baseline must run DEFAULT precision: HIGHEST on bf16
            # operands would handicap XLA (f32 multiplication passes) and
            # inflate the pallas speedups the routing table records
            xla_prec = (jax.lax.Precision.DEFAULT if tag == "bf16"
                        else mm._precision())
            xla_fn = jax.jit(functools.partial(jnp.matmul, precision=xla_prec))
            t_xla, runs_xla = time_median(lambda: xla_fn(a, b), iters=iters)
            entry = {"precision": tag, "n": n, "iters": iters,
                     "xla_s": round(t_xla, 6), "xla_runs": runs_xla,
                     "xla_tflops": round(flops / t_xla / 1e12, 2),
                     "xla_mfu_bf16peak": round(flops / t_xla / V5E_BF16_PEAK, 4),
                     "pallas": []}

            best_pallas = None
            for blocks in PALLAS_BLOCKS[tag]:
                try:
                    pf = jax.jit(functools.partial(mm._pallas_matmul3, blocks=blocks))
                    t_p, runs_p = time_median(lambda: pf(a, b), iters=iters)
                except Exception as e:  # remote-compiler 500s etc.
                    entry["pallas"].append({"blocks": blocks, "error": str(e)[:200]})
                    continue
                rec = {"blocks": blocks, "s": round(t_p, 6), "runs": runs_p,
                       "tflops": round(flops / t_p / 1e12, 2),
                       "mfu_bf16peak": round(flops / t_p / V5E_BF16_PEAK, 4)}
                entry["pallas"].append(rec)
                if best_pallas is None or t_p < best_pallas[0]:
                    best_pallas = (t_p, blocks)

            if best_pallas is not None and best_pallas[0] < t_xla * 0.95:
                choice = {"impl": "pallas", "blocks": list(best_pallas[1]),
                          "speedup_vs_xla": round(t_xla / best_pallas[0], 3)}
            else:
                choice = {"impl": "xla",
                          "pallas_ratio": (round(t_xla / best_pallas[0], 3)
                                           if best_pallas else None)}
            entry["choice"] = choice
            policy.setdefault(tag, {})[str(n)] = choice
            results["entries"].append(entry)
            print(f"{tag} n={n}: xla {entry['xla_tflops']} TF/s, "
                  f"pallas best {best_pallas and round(flops/best_pallas[0]/1e12,2)} "
                  f"TF/s -> {choice['impl']}", flush=True)

    results["policy"] = policy
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "gemm_sweep.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    # the routing table lightgrad_tpu.ops.matmul consults at runtime
    pol_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "lightgrad_tpu", "ops", "gemm_policy.json")
    with open(pol_path, "w") as f:
        json.dump(policy, f, indent=1)
    print(f"wrote {out} and {pol_path}")


if __name__ == "__main__":
    main()
