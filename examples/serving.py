"""Serving tour: compiled KV decode, batching, speculation, int8, TP.

Demonstrates the production inference surface on a small GPT (random
weights -- the point is the execution paths, which are bit-exact-tested
against their oracles in tests/):

  1. single-stream compiled KV-cache decode (one fixed-shape program)
  2. batched serving: ragged prompts, one vmap-lifted dispatch per round
  3. speculative decoding: draft proposes k, target verifies in one scan
  4. int8 post-training quantization of the same model
  5. (with >=2 devices) tensor-parallel decode via sharded captures

    python examples/serving.py
"""

import os
import sys
import time

if __name__ == "__main__" and os.environ.get("LIGHTGRAD_DIST_REAL") != "1":
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import lightgrad_tpu as light
from lightgrad_tpu.models import GPT, GPTConfig
from lightgrad_tpu.models.decoding import generate_speculative


def _iter_quant(m):
    stack = [m]
    while stack:
        x = stack.pop()
        if type(x).__name__ == "QuantLinear":
            yield x
        stack.extend(x._modules.values())


def main():
    np.random.seed(0)
    cfg = GPTConfig(vocab_size=256, n_positions=128, n_embd=128, n_layer=4,
                    n_head=4)
    model = GPT(cfg)
    rng = np.random.default_rng(0)
    prompt = [int(t) for t in rng.integers(0, 256, 8)]

    # 1. single-stream compiled decode
    t0 = time.time()
    out = model.generate(prompt, max_new_tokens=32, use_cache=True)
    t1 = time.time()
    out2 = model.generate(prompt, max_new_tokens=32, use_cache=True)
    t2 = time.time()
    print(f"[kv decode] 32 tokens: cold {t1-t0:.2f}s (compile), "
          f"warm {t2-t1:.3f}s ({32/(t2-t1):.0f} tok/s)")

    # 2. batched serving (ragged prompts)
    prompts = [[int(t) for t in rng.integers(0, 256, n)] for n in (5, 9, 7, 3)]
    t0 = time.time()
    outs = model.generate_batch(prompts, max_new_tokens=32)
    t1 = time.time()
    outs = model.generate_batch(prompts, max_new_tokens=32)
    t2 = time.time()
    n_tok = sum(len(o) - len(p) for o, p in zip(outs, prompts))
    print(f"[batched x{len(prompts)}] {n_tok} tokens: warm {t2-t1:.3f}s "
          f"({n_tok/(t2-t1):.0f} tok/s aggregate)")

    # 3. speculative decoding with a 4x smaller draft
    np.random.seed(1)
    draft = GPT(GPTConfig(vocab_size=256, n_positions=128, n_embd=32,
                          n_layer=1, n_head=2))
    spec = generate_speculative(model, draft, prompt, max_new_tokens=32, k=4)
    plain = model.generate(prompt, max_new_tokens=32, use_cache=True)
    assert [int(t) for t in spec] == [int(t) for t in plain]
    print(f"[speculative k=4] output bit-exact vs plain greedy "
          f"({len(spec)-len(prompt)} tokens)")

    # 4. int8 serving quantization
    light.quant.quantize_module(model, min_features=64)
    n_q = sum(1 for _ in _iter_quant(model))
    qout = model.generate(prompt, max_new_tokens=16, use_cache=False)
    assert len(qout) == len(prompt) + 16
    print(f"[int8] quantized {n_q} Linear layers; decode still runs")

    # 5. tensor-parallel decode (sharded captures compile SPMD)
    import jax

    if len(jax.devices()) >= 2:
        from lightgrad_tpu.parallel import make_mesh, shard_module, GPT_TP_RULES

        np.random.seed(0)
        tp_model = GPT(cfg)   # fresh float model, same weights as `plain`'s
        mesh = make_mesh(dp=1, tp=2)
        shard_module(tp_model, mesh, GPT_TP_RULES)
        tp_out = tp_model.generate(prompt, max_new_tokens=16, use_cache=True)
        ref = [int(t) for t in plain[: len(tp_out)]]
        assert [int(t) for t in tp_out] == ref
        print(f"[tp=2] sharded decode matches single-device tokens")

    print("serving tour green")


if __name__ == "__main__":
    import jax

    if os.environ.get("LIGHTGRAD_DIST_REAL") != "1":
        jax.config.update("jax_platforms", "cpu")
    main()
