"""Third-framework calibration (VERDICT r3 missing #2): the same BERT-layer
and GPT-2-small training workloads bench.py measures, built from jax's OWN
stack -- flax.linen modules, jax.nn.dot_product_attention (XLA's fused
attention path), optax AdamW -- so the repo's MFU numbers have an external
yardstick beyond reference-CPU.  Protocol matches bench.py: median of 5
regions, >=5 amortized in-program iterations, real readback at the end.

Run: ``timeout 1800 python benchmarks/jax_yardstick.py`` (holds the TPU).
Writes benchmarks/jax_yardstick.json.
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
import flax.linen as fnn
import optax

V5E_BF16_PEAK = 197e12  # v5e bf16 peak (394 is int8)


def time_median(run, repeats=5):
    run()  # compile
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        out = run()
        np.asarray(out)  # force readback through the tunnel
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2], [round(t, 5) for t in ts]


# --------------------------------------------------------------------------
# BERT layer (flax): hidden 768, heads 12, intermediate 3072 -- the same
# bench_bert_layer workload (bench.py), bf16 8x512 fwd+bwd
# --------------------------------------------------------------------------
class FlaxBertLayer(fnn.Module):
    hidden: int = 768
    heads: int = 12
    intermediate: int = 3072

    @fnn.compact
    def __call__(self, x):
        h = fnn.LayerNorm(dtype=x.dtype)(x)
        attn = fnn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.hidden, dtype=x.dtype)
        x = x + attn(h, h)
        h = fnn.LayerNorm(dtype=x.dtype)(x)
        h = fnn.Dense(self.intermediate, dtype=x.dtype)(h)
        h = fnn.gelu(h)
        return x + fnn.Dense(self.hidden, dtype=x.dtype)(h)


def bench_bert_layer(batch=8, seq=512, i_short=4, i_long=24):
    """Marginal per-iteration time by two-length differencing: the tunnel's
    per-dispatch cost (25-770 ms swings observed in degraded windows, the
    same order as a ~20 ms region) cancels between the two chain lengths."""
    layer = FlaxBertLayer()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (batch, seq, 768)), jnp.bfloat16)
    params = layer.init(jax.random.PRNGKey(0), x)

    def loss_fn(p, x):
        y = layer.apply(p, x)
        return (y.astype(jnp.float32) ** 2).mean()

    grad_fn = jax.value_and_grad(loss_fn)

    def make(iters):
        @jax.jit
        def prog(p, x):
            acc = jnp.zeros((), jnp.float32)
            for i in range(iters):
                v, g = grad_fn(p, x + jnp.asarray(i, x.dtype) * 1e-6)
                acc += v + jax.tree_util.tree_reduce(
                    lambda a, b: a + b.astype(jnp.float32).mean(), g,
                    jnp.zeros((), jnp.float32))
            return acc
        return prog

    f_s, f_l = make(i_short), make(i_long)
    s_s, vals_s = time_median(lambda: f_s(params, x))
    s_l, vals_l = time_median(lambda: f_l(params, x))
    dt = (s_l - s_s) / (i_long - i_short)
    h, inter = 768, 3072
    per_tok = 8 * h * h + 4 * h * inter
    attn = 4 * seq * h
    flops = 3 * batch * seq * (per_tok + attn)  # fwd+bwd = 3x fwd
    return dt, [vals_s, vals_l], flops / dt


# --------------------------------------------------------------------------
# GPT-2-small train step (flax + optax AdamW), bf16 compute / f32 params,
# batch 8 x seq 512 -- the same bench_gpt_train_amp workload
# --------------------------------------------------------------------------
class FlaxGPTBlock(fnn.Module):
    d: int
    heads: int

    @fnn.compact
    def __call__(self, x, mask):
        h = fnn.LayerNorm(dtype=x.dtype)(x)
        attn = fnn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.d, dtype=x.dtype)
        x = x + attn(h, h, mask=mask)
        h = fnn.LayerNorm(dtype=x.dtype)(x)
        h = fnn.gelu(fnn.Dense(4 * self.d, dtype=x.dtype)(h))
        return x + fnn.Dense(self.d, dtype=x.dtype)(h)


class FlaxGPT(fnn.Module):
    vocab: int = 50304
    d: int = 768
    layers: int = 12
    heads: int = 12
    seq: int = 512

    @fnn.compact
    def __call__(self, ids):
        x = fnn.Embed(self.vocab, self.d, dtype=jnp.bfloat16)(ids)
        x = x + fnn.Embed(self.seq, self.d, dtype=jnp.bfloat16)(
            jnp.arange(ids.shape[1]))
        mask = fnn.make_causal_mask(ids, dtype=jnp.bfloat16)
        for _ in range(self.layers):
            x = FlaxGPTBlock(self.d, self.heads)(x, mask)
        x = fnn.LayerNorm(dtype=x.dtype)(x)
        return fnn.Dense(self.vocab, use_bias=False, dtype=jnp.bfloat16)(x)


def bench_gpt_step(batch=8, seq=512):
    model = FlaxGPT(seq=seq)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 50304, (batch, seq)), jnp.int32)
    tgt = jnp.asarray(rng.integers(0, 50304, (batch, seq)), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    opt = optax.adamw(3e-4, weight_decay=0.01)
    opt_state = opt.init(params)

    def loss_fn(p, ids, tgt):
        logits = model.apply(p, ids).astype(jnp.float32)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, tgt).mean()

    def make(iters):
        @jax.jit
        def step(p, s, ids, tgt):
            for i in range(iters):
                loss, g = jax.value_and_grad(loss_fn)(p, ids, tgt)
                up, s = opt.update(g, s, p)
                p = optax.apply_updates(p, up)
            return p, s, loss
        return step

    # two-length differencing (see bench_bert_layer): params/opt state are
    # NOT threaded between timed calls so both lengths start from the same
    # state (the step count differs between programs)
    f_s, f_l = make(2), make(8)
    s_s, vals_s = time_median(lambda: f_s(params, opt_state, ids, tgt)[2])
    s_l, vals_l = time_median(lambda: f_l(params, opt_state, ids, tgt)[2])
    dt = (s_l - s_s) / (8 - 2)
    vals = [vals_s, vals_l]
    toks = batch * seq
    flops = 6 * n_params * toks
    return dt, vals, toks / dt, flops / dt, n_params


def main():
    assert jax.default_backend() == "tpu", "yardstick must run on the TPU"
    out = {"device": str(jax.devices()[0]),
           "stack": "flax.linen + optax (XLA's own attention path)",
           "protocol": "median of 5 regions, amortized in-program iters"}

    dt, vals, fl = bench_bert_layer()
    out["bert_layer_bf16_8x512_fwdbwd_s"] = round(dt, 5)
    out["bert_layer_bf16_8x512_regions"] = vals
    out["bert_layer_bf16_8x512_mfu"] = round(fl / V5E_BF16_PEAK, 4)
    print(f"flax BERT layer bf16 8x512 fwd+bwd: {dt*1e3:.2f} ms "
          f"(mfu {out['bert_layer_bf16_8x512_mfu']})", flush=True)

    dt, vals, tok_s, fl, n = bench_gpt_step()
    out["gpt2s_train_step_s"] = round(dt, 5)
    out["gpt2s_train_regions"] = vals
    out["gpt2s_tokens_per_s"] = round(tok_s, 1)
    out["gpt2s_mfu"] = round(fl / V5E_BF16_PEAK, 4)
    out["gpt2s_params"] = int(n)
    print(f"flax GPT-2-small train 8x512: {dt*1e3:.1f} ms/step = "
          f"{tok_s:.0f} tok/s (mfu {out['gpt2s_mfu']})", flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "jax_yardstick.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
