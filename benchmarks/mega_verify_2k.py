"""On-chip check of the CHUNKED decode megakernel at the long-context
serving shape that VMEM-OOM'd before chunking existed (r5: W=2048 bf16
cache block = 26.3 MB padded vs the 16 MB scoped limit).

GPT-2-small shapes, W=2048, prompt 1100 tokens: the online-softmax
recurrence spans chunks 0..2 and the pos-clamped index maps skip chunk 3
entirely.  bf16 and bf16+int8-KV paths, token parity vs the unrolled XLA
step.  Timing-free -- safe in a degraded tenancy window.
"""
import os, sys, time
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import lightgrad_tpu as light
import jax.numpy as jnp
from lightgrad_tpu.models import GPT, GPTConfig
from lightgrad_tpu.ops import runtime
from lightgrad_tpu.ops import decode_stack as ds

W, NEW = 2048, 24
cfg = GPTConfig(vocab_size=50257, n_positions=W, n_embd=768,
                n_layer=12, n_head=12)
light.set_device_init(0)
try:
    model = GPT(cfg)
finally:
    light.set_device_init(None)
light.amp.cast_module(model, jnp.bfloat16)

kw = dict(d=768, H=12, hd=64, NV=13, w_dt=jnp.bfloat16, int8=False, R=4)
print("planned chunks bf16:",
      ds._plan_chunks(W, cache_dt=jnp.bfloat16, kvq=False, **kw))
print("planned chunks int8-KV:",
      ds._plan_chunks(W, cache_dt=jnp.int8, kvq=True, **kw))

rng = np.random.default_rng(0)
prompt = [int(t) for t in rng.integers(0, cfg.vocab_size, 1100)]


def decode(mode):
    prev = runtime.set_kernel_mode(mode)
    try:
        for attr in ("_kv_fns", "_kv_batch_fns", "_dev_gen",
                     "_dev_gen_batch"):
            if hasattr(model, attr):
                delattr(model, attr)
        t0 = time.time()
        out = model.generate_device(prompt, max_new_tokens=NEW)
        print(f"  {mode}: compiled+ran in {time.time()-t0:.1f}s", flush=True)
        return out
    finally:
        runtime.set_kernel_mode(prev)


for tag, prep in [("bf16", None), ("bf16+int8kv",
                                   lambda: model.quantize_kv())]:
    if prep is not None:
        prep()
    ref = decode("xla")
    got = decode("pallas")
    n_agree = sum(a == b for a, b in zip(ref, got))
    status = "EXACT" if got == ref else f"{n_agree}/{len(ref)} tokens agree"
    print(f"{tag}: {status}", flush=True)
    if got != ref:
        print("  xla   :", ref[-16:])
        print("  pallas:", got[-16:])
print("DONE")
