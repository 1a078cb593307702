"""Bisect the GPT-2-small AMP train step: where do the milliseconds go?

Times, on the compiled-step path at the bench config (batch 8, seq 512):
  fwd            -- model forward to logits
  fwd+loss       -- plus cross-entropy
  fwd+bwd        -- plus backward (no optimizer)
  full step      -- plus AMP master update (the bench_gpt_train_amp number)
  loss alone     -- cross-entropy fwd+bwd on random logits
Differences localize the cost.  Run on the real chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import lightgrad_tpu as light
from lightgrad_tpu.autograd import TpuTensor
from benchmarks.bench_util import time_median

err = lambda *a: print(*a, flush=True)


def main():
    import jax.numpy as jnp
    from lightgrad_tpu.models.gpt import GPT, GPTConfig

    batch, seq = 8, 512
    np.random.seed(0)
    cfg = GPTConfig(vocab_size=50304, n_positions=seq, n_embd=768,
                    n_layer=12, n_head=12)
    model = GPT(cfg)
    mp = light.amp.MixedPrecision(
        model, lambda ps: light.optim.Adam(ps, lr=3e-4))
    rng = np.random.default_rng(0)
    ids = TpuTensor.from_numpy(
        rng.integers(0, cfg.vocab_size, (batch, seq)).astype(np.int32),
        requires_grad=False)
    tgt = TpuTensor.from_numpy(
        rng.integers(0, cfg.vocab_size, (batch * seq,)).astype(np.int32),
        requires_grad=False)

    def fwd():
        return model(ids)

    def fwd_loss():
        logits = model(ids).reshape(batch * seq, cfg.vocab_size)
        return light.loss.cross_entropy(logits, tgt)

    def fwd_bwd():
        logits = model(ids).reshape(batch * seq, cfg.vocab_size)
        loss = light.loss.cross_entropy(logits, tgt)
        mp.zero_grad()
        loss.backward()
        # read a grad into the返回 value: a standalone fwd+bwd program
        # whose grads nothing consumes gets its ENTIRE backward DCE'd by
        # XLA (measured: "fwd+bwd" 0.06 ms over "fwd+loss" -- impossible)
        g0 = next(iter(model.parameters())).grad
        return loss + g0.astype("float32").sum() * 1e-30

    def full():
        loss = fwd_bwd()
        mp.step()
        return loss

    logits_np = rng.normal(size=(batch * seq, cfg.vocab_size)).astype(np.float32)

    def loss_alone():
        lg = TpuTensor.from_numpy(logits_np)  # fresh: requires_grad path
        loss = light.loss.cross_entropy(lg, tgt)
        loss.backward()
        return loss

    # roll the token ids between calls: the tunnel DEDUPLICATES identical
    # (program, args) executions by content (see bench._dedup_bump), and
    # the fwd/fwd+loss/fwd+bwd programs otherwise re-see identical inputs
    # every call (measured before this fix: "fwd+bwd" appeared only 0.1 ms
    # over "fwd" -- a physically impossible cached-return artifact)
    import jax
    import jax.numpy as jnp
    bump = jax.jit(lambda t: (t + 1) % cfg.vocab_size)

    for name, f in [("fwd", fwd), ("fwd+loss", fwd_loss),
                    ("fwd+bwd", fwd_bwd), ("full", full)]:
        c = light.jit(f)

        def call():
            ids._set_data(bump(ids.data))
            return c().data

        dt, vals = time_median(call, iters=10, repeats=5)
        err(f"{name:10s} {dt*1e3:8.2f} ms   {vals}")


if __name__ == "__main__":
    main()
