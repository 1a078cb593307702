"""Per-token time budget for the device-loop decode (VERDICT r3 next #1).

Decomposes one GPT-2-small decode step into its HBM-traffic terms by timing
ABLATED variants of the same ``lax.scan``-over-steps program on the real
chip (ablation, not tracing: the axon tunnel's profiler timings are
unreliable, while wall-clock over a 64-step in-program scan amortizes
dispatch below 2%):

  full         -- the production step (weights + KV + head + argmax)
  fixed_tok    -- argmax sampling replaced by a constant token (isolates the
                  50k-vocab argmax + carry feedback)
  no_head      -- lm-head GEMV replaced by a 768->16 stub (isolates the
                  (50257, 768) head read, ~31% of weight bytes)
  no_attn      -- attention scores/softmax/context skipped; K/V writes kept
                  (isolates KV-cache read + softmax)
  no_mlp       -- the two MLP GEMVs skipped (isolates ~60% of layer bytes)
  no_kv_write  -- cache threads through unmodified (isolates the cache
                  update's write/copy cost -- nonzero means XLA failed to
                  alias the carry in place)

The step body here MIRRORS models/gpt.py::_kv_functions.step (same math,
same cache layout) so the ablations correspond 1:1; `full` is additionally
cross-checked against the production step.fn timing.

Run:  timeout 1800 python benchmarks/decode_budget.py [--steps 64]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(dtype_name: str, window: int, vocab: int = 50257):
    import jax.numpy as jnp

    import lightgrad_tpu as light
    from lightgrad_tpu.models import GPT, GPTConfig

    cfg = GPTConfig(vocab_size=vocab, n_positions=window, n_embd=768,
                    n_layer=12, n_head=12)
    light.set_device_init(0)
    try:
        model = GPT(cfg)
    finally:
        light.set_device_init(None)
    if dtype_name in ("bf16", "int8"):
        light.amp.cast_module(model, jnp.bfloat16)
    if dtype_name == "int8":
        model.quantize_serving()
    return model, cfg


def make_step(cfg, p, ablate=()):
    """Mirror of models/gpt.py::_kv_functions.step with ablation switches."""
    import jax
    import jax.numpy as jnp

    H, hd = cfg.n_head, cfg.n_embd // cfg.n_head
    L, W = cfg.n_layer, cfg.n_positions
    eps = cfg.layer_norm_epsilon
    scale = float(1.0 / np.sqrt(hd))
    cdt = p["wte.weight"].dtype

    def mm(h, p, name):
        q = p.get(name + "#q")
        if q is None:
            return h @ p[name].T
        return (h @ q.T.astype(cdt)) * p[name + "#s"]

    def head_mm(x, p):
        if "no_head" in ablate:
            # 16-column stub, data-dependent (argmax over the 16 real
            # entries; the -1e30 tail keeps shape without being foldable)
            small = (x @ p["wte.weight"][:16].T)[0]
            return jnp.full((cfg.vocab_size,), -1e30, cdt).at[:16].set(small)[None]
        if "head#q" in p:
            return (x @ p["head#q"].T.astype(cdt)) * p["head#s"]
        return x @ p["wte.weight"].T

    def ln(x, w, b):
        m = x.mean(-1, keepdims=True)
        v = ((x - m) ** 2).mean(-1, keepdims=True)
        return (x - m) / jnp.sqrt(v + eps) * w + b

    def gelu(x):
        return 0.5 * x * (1 + jnp.tanh(0.7978845608028654 * (x + 0.044715 * x**3)))

    def step(p, cache, pos, tok):
        x = p["wte.weight"][tok] + p["wpe.weight"][pos]
        x = x[None, :]
        pos_mask = (jnp.arange(W) <= pos)[None, None, :]
        for l in range(L):
            pre = f"h.{l}."
            h = ln(x, p[pre + "ln_1.weight"], p[pre + "ln_1.bias"])
            qkv = mm(h, p, pre + "attn.c_attn.weight") \
                + p[pre + "attn.c_attn.bias"]
            q, k, v = [a.reshape(H, 1, hd) for a in jnp.split(qkv[0], 3)]
            if "no_kv_write" in ablate:
                kc, vc = cache[l, 0], cache[l, 1]
            else:
                kc = jax.lax.dynamic_update_slice(cache[l, 0], k, (0, pos, 0))
                vc = jax.lax.dynamic_update_slice(cache[l, 1], v, (0, pos, 0))
                cache = cache.at[l, 0].set(kc).at[l, 1].set(vc)
            if "no_attn" in ablate:
                att = v.transpose(1, 0, 2).reshape(1, H * hd)
            else:
                scores = jnp.einsum("hqd,hkd->hqk", q, kc) * scale
                scores = jnp.where(pos_mask, scores, -1e30)
                att = jax.nn.softmax(scores, axis=-1) @ vc
                att = att.transpose(1, 0, 2).reshape(1, H * hd)
            x = x + mm(att, p, pre + "attn.c_proj.weight") \
                + p[pre + "attn.c_proj.bias"]
            if "no_mlp" not in ablate:
                h2 = ln(x, p[pre + "ln_2.weight"], p[pre + "ln_2.bias"])
                h2 = gelu(mm(h2, p, pre + "c_fc.weight")
                          + p[pre + "c_fc.bias"])
                x = x + mm(h2, p, pre + "c_proj.weight") \
                    + p[pre + "c_proj.bias"]
        x = ln(x, p["ln_f.weight"], p["ln_f.bias"])
        return cache, head_mm(x, p)[0]

    return step


def time_scan(stepfn, sample, p, cache0, steps, repeats=5):
    import jax
    import jax.numpy as jnp

    def run(p, cache, tok):
        def body(c, _):
            cache, tok = c
            cache, logits = stepfn(p, cache, jnp.int32(8), tok)
            return (cache, sample(logits, tok)), logits[0]

        (cache, _), outs = jax.lax.scan(body, (cache, tok), None,
                                        length=steps)
        return outs

    jrun = jax.jit(run)
    out = jrun(p, cache0, jnp.int32(1))
    float(np.asarray(out).ravel()[0])
    vals = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jrun(p, cache0, jnp.int32(1))
        float(np.asarray(out).ravel()[0])
        vals.append((time.perf_counter() - t0) / steps)
    return float(np.median(vals)), [round(v * 1e3, 4) for v in vals]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--window", type=int, default=256)
    ap.add_argument("--dtypes", default="f32,bf16,int8")
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    results = {"steps": args.steps, "window": args.window}
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    ablations = [(), ("fixed_tok",), ("no_head",), ("no_attn",),
                 ("no_mlp",), ("no_kv_write",)]

    for dt in args.dtypes.split(","):
        model, cfg = build(dt, args.window)
        model._kv_fns = model._kv_functions()
        init_cache, prefill, step = model._kv_fns
        p = dict(step.params)
        pb = int(sum(np.dtype(v.dtype).itemsize * v.size for v in p.values()))
        cache0 = init_cache()
        kvb = int(np.dtype(cache0.dtype).itemsize * cache0.size)

        argmax = lambda lg, _t: jnp.argmax(lg).astype(jnp.int32)
        fixed = lambda _lg, t: t

        row = {"param_mb": round(pb / 1e6, 1), "kv_cache_mb": round(kvb / 1e6, 1)}
        # cross-check: the production step.fn vs this file's mirror
        dtm, vals = time_scan(step.fn, argmax, p, cache0, args.steps,
                              args.repeats)
        row["production"] = {"ms_per_tok": round(dtm * 1e3, 4),
                             "regions_ms": vals}
        print(f"{dt:5s} production : {dtm*1e3:7.3f} ms/tok "
              f"({1.0/dtm:5.0f} tok/s, {pb/dtm/1e9:6.1f} GB/s implied)",
              file=sys.stderr)

        for ab in ablations:
            name = "+".join(ab) if ab else "full"
            sample = fixed if "fixed_tok" in ab else argmax
            stepfn = make_step(cfg, p, ablate=ab)
            dtm, vals = time_scan(stepfn, sample, p, cache0, args.steps,
                                  args.repeats)
            row[name] = {"ms_per_tok": round(dtm * 1e3, 4), "regions_ms": vals}
            print(f"{dt:5s} {name:11s}: {dtm*1e3:7.3f} ms/tok "
                  f"({1.0/dtm:5.0f} tok/s)", file=sys.stderr)
        results[dt] = row
        del model

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
