"""Beam search over the compiled KV-cache step (models/decoding.py).

Invariants checked: beam_size=1 == greedy; larger beams never find a
lower-logprob sequence than greedy (with length_penalty=1 and no eos);
eos_id terminates hypotheses; works for both GPT and Llama."""

import numpy as np
import pytest

import lightgrad_tpu as light
from lightgrad_tpu.autograd import TpuTensor
from lightgrad_tpu.models import (GPT, GPTConfig, Llama, LlamaConfig,
                                  beam_search)


def _trained_gpt(seed=11):
    np.random.seed(seed)
    cfg = GPTConfig(vocab_size=59, n_positions=24, n_embd=32, n_layer=2,
                    n_head=4)
    model = GPT(cfg)
    optim = light.optim.Adam(model.parameters(), lr=3e-3)
    seq = (np.arange(23) * 5 % 59).astype(np.int32)
    x = TpuTensor.from_numpy(seq[None, :-1], requires_grad=False)
    y = TpuTensor.from_numpy(seq[1:], requires_grad=False)
    for _ in range(8):
        loss = light.loss.cross_entropy(model(x).reshape(22, cfg.vocab_size), y)
        optim.zero_grad(); loss.backward(); optim.step()
    return model, seq


def _seq_logprob(model, ids, n_prompt):
    """Total log-prob of generated tokens under the model (oracle scorer)."""
    import jax

    x = TpuTensor.from_numpy(np.asarray([ids[:-1]], np.int32),
                             requires_grad=False)
    with light.no_grad():
        logits = model(x).numpy()[0]
    lp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    return sum(lp[t - 1, ids[t]] for t in range(n_prompt, len(ids)))


@pytest.mark.slow  # 16 s: two full decode-loop compiles on the 1-core host
def test_beam1_equals_greedy():
    model, seq = _trained_gpt()
    prompt = seq[:4].tolist()
    greedy = model.generate(prompt, max_new_tokens=8)
    beam1 = model.generate(prompt, max_new_tokens=8, num_beams=1)
    assert greedy == beam1


def test_beam_never_worse_than_greedy():
    model, seq = _trained_gpt()
    prompt = seq[:4].tolist()
    greedy = model.generate(prompt, max_new_tokens=8)
    beam = model.generate(prompt, max_new_tokens=8, num_beams=4)
    assert len(beam) == len(greedy) == 12
    lp_g = _seq_logprob(model, greedy, 4)
    lp_b = _seq_logprob(model, beam, 4)
    assert lp_b >= lp_g - 1e-4, (lp_b, lp_g)


def test_beam_eos_terminates():
    model, seq = _trained_gpt()
    prompt = seq[:4].tolist()
    full = model.generate(prompt, max_new_tokens=8, num_beams=3)
    # force the first generated token to be "eos": hypothesis ends there
    out = beam_search(model, prompt, max_new_tokens=8, beam_size=3,
                      eos_id=full[4], length_penalty=0.0)
    assert out[-1] == full[4] and len(out) <= len(full)


def test_beam_search_llama():
    np.random.seed(13)
    cfg = LlamaConfig(vocab_size=47, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      max_position_embeddings=24)
    model = Llama(cfg)
    prompt = [1, 5, 9]
    greedy = model.generate(prompt, max_new_tokens=6)
    beam1 = model.generate(prompt, max_new_tokens=6, num_beams=1)
    beam3 = model.generate(prompt, max_new_tokens=6, num_beams=3)
    assert greedy == beam1
    assert len(beam3) == len(greedy)
