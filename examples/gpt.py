"""Train a small character-level GPT on this repo's README, then sample.

Offline-friendly second model family (beyond BERT): causal-LM training with
the fused flash-attention kernel and the jit step compiler.  With network
access, ``--pretrained`` loads HuggingFace GPT-2 instead and generates text.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import lightgrad_tpu as light
from lightgrad_tpu.autograd import TpuTensor
from lightgrad_tpu.models import GPT, GPTConfig, GPT2Tokenizer


def train_char_gpt(steps=300, batch=16, seq=64):
    text = open(os.path.join(os.path.dirname(__file__), "..", "README.md")).read()
    chars = sorted(set(text))
    stoi = {c: i for i, c in enumerate(chars)}
    data = np.array([stoi[c] for c in text], dtype=np.int32)
    print(f"corpus: {len(data)} chars, vocab {len(chars)}")

    cfg = GPTConfig(vocab_size=len(chars), n_positions=seq, n_embd=128,
                    n_layer=4, n_head=4)
    np.random.seed(0)
    model = GPT(cfg)
    optim = light.optim.Adam(model.parameters(), lr=3e-4)

    # device-resident training windows
    rng = np.random.default_rng(0)
    starts = rng.integers(0, len(data) - seq - 1, steps * batch)
    xs = np.stack([data[s : s + seq] for s in starts])
    ys = np.stack([data[s + 1 : s + seq + 1] for s in starts])
    xs_dev = TpuTensor.from_numpy(xs, requires_grad=False)
    ys_dev = TpuTensor.from_numpy(ys, requires_grad=False)

    def step(off):
        x = xs_dev.narrow(off, batch)
        y = ys_dev.narrow(off, batch)
        logits = model(x).reshape(batch * seq, cfg.vocab_size)
        loss = light.loss.cross_entropy(logits, y.reshape(-1))
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
    # prompt + new must fit the n_positions=64 window for KV-cache decode
    out = model.generate(ids, max_new_tokens=64 - len(ids), temperature=0.6)
    print("sample:", repr("".join(chars[i] for i in out)))


def run_pretrained(prompt: str):
    model, cfg = GPT.from_pretrained("gpt2")
    tok = GPT2Tokenizer.from_pretrained("gpt2")
    model.map_parameters(lambda p: p.tpu())
    ids = tok.encode(prompt)
    out = model.generate(ids, max_new_tokens=30, temperature=0.7)
    print(tok.decode(out))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrained", action="store_true")
    ap.add_argument("--prompt", default="The tensor processing unit")
    ap.add_argument("--steps", type=int, default=300)
    args = ap.parse_args()
    if args.pretrained:
        run_pretrained(args.prompt)
    else:
        train_char_gpt(steps=args.steps)
