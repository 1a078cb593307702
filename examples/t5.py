"""Train a tiny T5 on a character-reversal task, then decode with it.

Encoder-decoder example (the reference has none -- its examples stop at
encoder-only BERT, reference examples/bert.py): teacher-forced seq2seq
training with cross-attention and relative-position biases, followed by
greedy generation.  The task -- reverse a random character string -- is
impossible for a causal LM without an encoder, so a falling loss and
correct reversals demonstrate the encoder-decoder path specifically.

With network access, ``--pretrained`` loads HuggingFace t5-small instead.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import lightgrad_tpu as light
from lightgrad_tpu.autograd import TpuTensor
from lightgrad_tpu.models import T5Config, T5ForConditionalGeneration

VOCAB = 30  # 0=pad/start, 1=eos, 2..29 = symbols


def make_batch(rng, batch, seq):
    src = rng.integers(2, VOCAB, (batch, seq)).astype(np.int32)
    labels = src[:, ::-1].copy()  # target: the reversed string
    return src, labels


def train(steps=800, batch=32, seq=8):
    cfg = T5Config(vocab_size=VOCAB, d_model=64, d_kv=16, d_ff=128,
                   num_layers=2, num_decoder_layers=2, num_heads=4,
                   relative_attention_num_buckets=16,
                   relative_attention_max_distance=seq + 2,
                   dropout_rate=0.0)
    np.random.seed(0)
    model = T5ForConditionalGeneration(cfg)
    optim = light.optim.Adam(model.parameters(), lr=3e-3)

    rng = np.random.default_rng(0)
    # one device-resident pool of batches, sliced by traced offset
    src_all, lab_all = make_batch(rng, steps * batch, seq)
    dec_all = model.shift_right(lab_all)
    src_dev = TpuTensor.from_numpy(src_all, requires_grad=False)
    dec_dev = TpuTensor.from_numpy(dec_all, requires_grad=False)
    lab_dev = TpuTensor.from_numpy(lab_all, requires_grad=False)

    def step(off):
        x = src_dev.narrow(off, batch)
        d = dec_dev.narrow(off, batch)
        y = lab_dev.narrow(off, batch)
        logits = model(x, d).reshape(batch * seq, VOCAB)
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
            loss.numpy()  # sync past compile before timing
            t0 = time.time()
        if i % 100 == 0 or i == steps - 1:
            print(f"step {i:4d}  loss {loss.item():.4f}")
    if t0 is not None:
        dt = time.time() - t0
        print(f"{steps - 3} steps in {dt:.2f}s = {(steps - 3) / dt:.1f} steps/s")

    # decode a few held-out strings
    model.eval()
    src, labels = make_batch(np.random.default_rng(999), 4, seq)
    out = model.generate(TpuTensor.from_numpy(src, requires_grad=False),
                         max_new_tokens=seq)
    correct = (out[:, :seq] == labels).all(axis=1)
    for s, o, ok in zip(src, out, correct):
        print(f"  {[int(v) for v in s]} -> {[int(v) for v in o[:seq]]} "
              f"{'OK' if ok else 'MISS'}")
    print(f"exact reversals: {int(correct.sum())}/{len(correct)}")
    return float(correct.mean())


def pretrained_demo():
    model, cfg = T5ForConditionalGeneration.from_pretrained("t5-small")
    print("loaded t5-small;", sum(np.prod(p.shape) for p in model.parameters()),
          "params")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--pretrained", action="store_true")
    args = ap.parse_args()
    if args.pretrained:
        pretrained_demo()
    else:
        train(steps=args.steps)
