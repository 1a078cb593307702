"""Train a small character-level LLaMA (RoPE/RMSNorm/SwiGLU/GQA) and sample.

Third model family beyond the reference's BERT example: the modern decoder
recipe, trained with the jit step compiler and optional master-weight AMP
(bf16 compute, f32 masters -- the precision axis the reference lacks), then
sampled through the compiled KV-cache decode path.  With network access,
``--pretrained <hf-name>`` loads a HuggingFace LLaMA-family checkpoint.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import lightgrad_tpu as light
from lightgrad_tpu.autograd import TpuTensor
from lightgrad_tpu.models import Llama, LlamaConfig


def train_char_llama(steps=300, batch=16, seq=64, use_amp=False):
    text = open(os.path.join(os.path.dirname(__file__), "..", "README.md")).read()
    chars = sorted(set(text))
    stoi = {c: i for i, c in enumerate(chars)}
    data = np.array([stoi[c] for c in text], dtype=np.int32)
    print(f"corpus: {len(data)} chars, vocab {len(chars)}")

    cfg = LlamaConfig(vocab_size=len(chars), hidden_size=128,
                      intermediate_size=256, num_hidden_layers=4,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=max(seq, 192))
    np.random.seed(0)
    model = Llama(cfg)
    if use_amp:
        import jax.numpy as jnp

        mp = light.amp.MixedPrecision(
            model, lambda ps: light.optim.Adam(ps, lr=3e-4),
            compute_dtype=jnp.bfloat16)
        print("AMP: bf16 compute, f32 master weights")
    else:
        optim = light.optim.Adam(model.parameters(), lr=3e-4)

    rng = np.random.default_rng(0)
    starts = rng.integers(0, len(data) - seq - 1, steps * batch)
    xs = np.stack([data[s: s + seq] for s in starts])
    ys = np.stack([data[s + 1: s + seq + 1] for s in starts])
    xs_dev = TpuTensor.from_numpy(xs, requires_grad=False)
    ys_dev = TpuTensor.from_numpy(ys, requires_grad=False)

    def step(off):
        x = xs_dev.narrow(off, batch)
        y = ys_dev.narrow(off, batch)
        logits = model(x).reshape(batch * seq, cfg.vocab_size)
        loss = light.loss.cross_entropy(logits, y.reshape(-1))
        if use_amp:
            mp.zero_grad()
            loss.backward()
            mp.step()
        else:
            optim.zero_grad()
            loss.backward()
            optim.step()
        return loss

    fn = light.jit(step)
    offs = [TpuTensor.from_numpy(np.int32(i * batch), requires_grad=False)
            for i in range(steps)]
    t0 = None
    for i in range(steps):
        loss = fn(offs[i])
        if i == 2:
            loss.numpy()
            t0 = time.perf_counter()
        if (i + 1) % 50 == 0:
            print(f"step {i + 1}: loss {loss.item():.4f}")
    loss.numpy()
    dt = time.perf_counter() - t0
    print(f"{steps - 3} steps in {dt:.2f}s ({(steps - 3) / dt:.1f} steps/s)")

    prompt = "lightgrad"
    ids = [stoi.get(c, 0) for c in prompt]
    t0 = time.perf_counter()
    out = model.generate(ids, max_new_tokens=120, temperature=0.6)
    dt = time.perf_counter() - t0
    print(f"KV-cache decode: 120 tokens in {dt:.2f}s ({120 / dt:.1f} tok/s)")
    print("sample:", repr("".join(chars[i] for i in out)))


def run_pretrained(name: str, prompt: str):
    model, cfg = Llama.from_pretrained(name)
    model.map_parameters(lambda p: p.tpu())
    ids = [1] + list(prompt.encode("utf-8"))  # byte fallback (no tokenizer dep)
    out = model.generate(ids, max_new_tokens=30, temperature=0.7)
    print(out)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrained", default=None,
                    help="HF model name, e.g. JackFram/llama-68m")
    ap.add_argument("--prompt", default="The tensor processing unit")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--amp", action="store_true", help="bf16 master-weight AMP")
    args = ap.parse_args()
    if args.pretrained:
        run_pretrained(args.pretrained, args.prompt)
    else:
        train_char_llama(steps=args.steps, use_amp=args.amp)
