"""Functional on-chip check of the decode megakernel (ops/decode_stack.py):
Mosaic-compiles at GPT-2-small shapes and the greedy device-loop decode
matches the unrolled-XLA step token-for-token.  Timing-free -- safe to run
in a degraded tenancy window.  f32 + bf16 + int8 paths.
"""
import os, sys, time
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import lightgrad_tpu as light
import jax.numpy as jnp
from lightgrad_tpu.models import GPT, GPTConfig
from lightgrad_tpu.ops import runtime

W, NEW = 128, 48
cfg = GPTConfig(vocab_size=50257, n_positions=W, n_embd=768,
                n_layer=12, n_head=12)
light.set_device_init(0)
try:
    model = GPT(cfg)
finally:
    light.set_device_init(None)

rng = np.random.default_rng(0)
prompt = [int(t) for t in rng.integers(0, cfg.vocab_size, 32)]


def decode(mode):
    prev = runtime.set_kernel_mode(mode)
    try:
        for attr in ("_kv_fns", "_kv_batch_fns", "_dev_gen",
                     "_dev_gen_batch"):  # force rebuild under this mode
            if hasattr(model, attr):
                delattr(model, attr)
        t0 = time.time()
        out = model.generate_device(prompt, max_new_tokens=NEW)
        print(f"  {mode}: compiled+ran in {time.time()-t0:.1f}s")
        return out
    finally:
        runtime.set_kernel_mode(prev)


for tag, prep in [("f32", None), ("bf16", lambda: light.amp.cast_module(
        model, jnp.bfloat16)), ("int8", lambda: model.quantize_serving())]:
    if prep is not None:
        prep()
    ref = decode("xla")
    got = decode("pallas")
    n_agree = sum(a == b for a, b in zip(ref, got))
    status = "EXACT" if got == ref else f"{n_agree}/{len(ref)} tokens agree"
    print(f"{tag}: {status}")
    if got != ref:
        print("  xla   :", ref[-16:])
        print("  pallas:", got[-16:])
print("DONE")
