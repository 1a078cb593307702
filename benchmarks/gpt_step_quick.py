"""Quick GPT-2-small AMP timing: fwd and full step (post-routing-change)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import lightgrad_tpu as light
from lightgrad_tpu.autograd import TpuTensor
from benchmarks.bench_util import time_median

def main():
    from lightgrad_tpu.models.gpt import GPT, GPTConfig
    batch, seq = 8, 512
    np.random.seed(0)
    cfg = GPTConfig(vocab_size=50304, n_positions=seq, n_embd=768,
                    n_layer=12, n_head=12)
    model = GPT(cfg)
    mp = light.amp.MixedPrecision(model, lambda ps: light.optim.Adam(ps, lr=3e-4))
    rng = np.random.default_rng(0)
    ids = TpuTensor.from_numpy(
        rng.integers(0, cfg.vocab_size, (batch, seq)).astype(np.int32),
        requires_grad=False)
    tgt = TpuTensor.from_numpy(
        rng.integers(0, cfg.vocab_size, (batch * seq,)).astype(np.int32),
        requires_grad=False)

    def fwd():
        return model(ids)

    def full():
        logits = model(ids).reshape(batch * seq, cfg.vocab_size)
        loss = light.loss.cross_entropy(logits, tgt)
        mp.zero_grad()
        loss.backward()
        mp.step()
        return loss

    for name, f in [("fwd", fwd), ("full", full)]:
        c = light.jit(f)
        dt, vals = time_median(lambda: c().data, iters=10, repeats=5)
        print(f"{name:6s} {dt*1e3:8.2f} ms  {vals}", flush=True)

if __name__ == "__main__":
    main()
