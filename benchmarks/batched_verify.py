"""On-chip check + rough timing of the batched-slot decode megakernel
(ops/decode_stack.decode_stack_batch) at GPT-2-small shapes: batch-8
device generation parity vs per-slot single-stream decode, then an
aggregate-throughput probe of the batched vs vmap-lift step programs.
"""
import os, sys, time
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import lightgrad_tpu as light
import jax
import jax.numpy as jnp
from lightgrad_tpu.models import GPT, GPTConfig
from lightgrad_tpu.ops import runtime

W, NEW, B = 256, 48, 8
cfg = GPTConfig(vocab_size=50257, n_positions=W, n_embd=768,
                n_layer=12, n_head=12)
light.set_device_init(0)
try:
    model = GPT(cfg)
finally:
    light.set_device_init(None)
light.amp.cast_module(model, jnp.bfloat16)

rng = np.random.default_rng(0)
prompts = [[int(t) for t in rng.integers(0, cfg.vocab_size,
                                         int(rng.integers(8, 49)))]
           for _ in range(B)]

prev = runtime.set_kernel_mode("pallas")
try:
    t0 = time.time()
    outs = model.generate_batch_device(prompts, max_new_tokens=NEW)
    print(f"batched gen compiled+ran in {time.time()-t0:.1f}s", flush=True)
    singles = [model.generate_device(p, max_new_tokens=NEW) for p in prompts]
    n_match = sum(o == s for o, s in zip(outs, singles))
    print(f"batch-vs-single parity: {n_match}/{B} sequences identical")
    if n_match < B:
        for o, s in zip(outs, singles):
            if o != s:
                pre = next((i for i, (a, b) in enumerate(zip(o, s))
                            if a != b), len(o))
                print(f"  diverged at {pre}/{len(o)}")

    # aggregate throughput: repeat timed batched runs (whole generation,
    # readback forced by the host conversion inside generate_batch_device)
    # fresh seed per rep: the PRNG key is a program argument (greedy
    # ignores it) and the tunnel DEDUPLICATES identical (program, args)
    # executions -- same-args repeats return cached buffers at ~RTT cost
    ts = []
    for i in range(5):
        t0 = time.time()
        model.generate_batch_device(prompts, max_new_tokens=NEW,
                                    seed=1000 + i)
        ts.append(time.time() - t0)
    med = sorted(ts)[2]
    print(f"batched device gen: {B*NEW/med:.0f} tok/s aggregate "
          f"(median {med:.3f}s, runs {[round(t,3) for t in ts]})")

    ts = []
    for i in range(3):
        t0 = time.time()
        for j, p in enumerate(prompts[:2]):
            model.generate_device(p, max_new_tokens=NEW, seed=2000 + 2*i + j)
        ts.append(time.time() - t0)
    med = sorted(ts)[1]
    print(f"single-stream x2: {2*NEW/med:.0f} tok/s aggregate "
          f"(median {med:.3f}s)")
finally:
    runtime.set_kernel_mode(prev)
print("DONE")
