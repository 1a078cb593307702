"""Minimal on-chip drive of the int8 KV decode path (tiny GPT, few tokens):
compiles + runs the quantized-cache step end-to-end on the real chip and
checks output shape/determinism.  Timing-free."""
import os, sys, time
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import lightgrad_tpu as light
from lightgrad_tpu.models import GPT, GPTConfig

np.random.seed(0)
model = GPT(GPTConfig(vocab_size=512, n_positions=64, n_embd=128,
                      n_layer=2, n_head=2)).quantize_kv()
t0 = time.time()
out1 = model.generate_device([5, 9, 2], max_new_tokens=12)
out2 = model.generate_device([5, 9, 2], max_new_tokens=12)
assert out1 == out2 and len(out1) == 15, (out1, out2)
print(f"int8-KV device decode OK on {__import__('jax').devices()[0]} "
      f"({time.time()-t0:.1f}s): {out1}")
