"""Measure the chunked megakernel's O(pos) DMA claim: decode cost in a
W=2048 window should track the decode POSITION (chunks past pos are never
fetched -- their index-map block indices clamp), not the window size.

GPT-2-small bf16, W=2048, C=4 (Wc=512): prompts of 200 vs 1800 tokens,
net ms/token by two-length differencing (64 vs 192 new tokens), fresh
seed per call (tunnel execution dedup).  Expected: pos~200 streams 1 of 4
chunks per layer, pos~1800 streams all 4 -- the difference is the cache
bandwidth term (~L*2*d*pos bytes/token) on top of fixed weight streaming.

MEASURED (2026-08-21): pos~200 = 0.415 ms/token (2409 tok/s), pos~1800 =
0.482 ms/token (2073 tok/s).  The 0.067 ms/token delta matches the
predicted cache-read difference (L*2*d*1600 tokens * 2 B = 59 MB/token
at ~880 GB/s = 0.074 ms) -- chunks past the decode position genuinely
cost zero DMA, and the cache stream rides at HBM speed.
"""
import os, sys, time
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import lightgrad_tpu as light
import jax.numpy as jnp
from lightgrad_tpu.models import GPT, GPTConfig

W = 2048
cfg = GPTConfig(vocab_size=50257, n_positions=W, n_embd=768,
                n_layer=12, n_head=12)
light.set_device_init(0)
try:
    model = GPT(cfg)
finally:
    light.set_device_init(None)
light.amp.cast_module(model, jnp.bfloat16)

rng = np.random.default_rng(0)
seed = [100]


def timed(prompt, n, reps=3):
    model.generate_device(prompt, max_new_tokens=n)  # compile
    ts = []
    for _ in range(reps):
        seed[0] += 1
        t0 = time.time()
        out = model.generate_device(prompt, max_new_tokens=n, seed=seed[0])
        ts.append(time.time() - t0)
    assert len(out) == len(prompt) + n
    return sorted(ts)[len(ts) // 2]


for plen in (200, 1800):
    prompt = [int(t) for t in rng.integers(0, cfg.vocab_size, plen)]
    s64 = timed(prompt, 64)
    s192 = timed(prompt, 192)
    net = (s192 - s64) / 128
    print(f"pos~{plen}: 64tok {s64:.3f}s, 192tok {s192:.3f}s -> net "
          f"{net*1e3:.3f} ms/token ({1/net:.0f} tok/s)", flush=True)
print("DONE")
