"""Continuous-batching engine: token-exact vs generate, fewer dispatches."""

import numpy as np
import pytest

from lightgrad_tpu.models import GPT, GPTConfig
from lightgrad_tpu.serving import InferenceEngine


@pytest.fixture(scope="module")
def model():
    np.random.seed(7)
    return GPT(GPTConfig(vocab_size=61, n_embd=32, n_layer=2, n_head=4,
                         n_positions=48))


def test_continuous_batching_token_exact(model):
    """Ragged prompts/lengths through 3 slots reproduce per-request greedy
    decoding exactly, in far fewer step dispatches than serial decoding."""
    rng = np.random.default_rng(0)
    reqs = []
    engine = InferenceEngine(model, slots=3)
    specs = [(list(rng.integers(1, 61, n)), m)
             for n, m in [(3, 9), (7, 4), (2, 12), (5, 6), (4, 8), (6, 3),
                          (3, 10)]]
    for prompt, m in specs:
        reqs.append(engine.submit(prompt, max_new_tokens=m))
    done = engine.run()
    assert len(done) == len(specs) and all(r.done for r in done)

    serial_steps = 0
    for req, (prompt, m) in zip(reqs, specs):
        want = [int(t) for t in model.generate(prompt, max_new_tokens=m,
                                               use_cache=True)]
        assert req.tokens == want, (req.tokens, want)
        serial_steps += m - 1  # per-request one-token dispatches
    # the engine overlaps requests: its dispatch count beats serial decode
    assert engine.stats["step_dispatches"] < serial_steps, engine.stats
    assert engine.stats["prefills"] == len(specs)


def test_eos_frees_slot_early(model):
    """A request hitting eos retires its slot, which admits the queue."""
    engine = InferenceEngine(model, slots=1)
    # find a token the tiny random model emits greedily from this prompt
    probe = model.generate([5, 9], max_new_tokens=2, use_cache=True)
    eos = int(probe[-1])
    a = engine.submit([5, 9], max_new_tokens=10, eos_id=eos)
    b = engine.submit([3, 4, 5], max_new_tokens=3)
    done = engine.run()
    assert {r.id for r in done} == {a.id, b.id}
    assert a.tokens[-1] == eos and a.n_generated < 10
    assert b.n_generated == 3


def test_per_request_sampling_params(model):
    """Sampling config rides per request (host-side): temperature-0 and
    temperature>0 requests coexist in one batch."""
    engine = InferenceEngine(model, slots=2, rng=np.random.default_rng(1))
    g = engine.submit([2, 3, 4], max_new_tokens=5)                 # greedy
    s = engine.submit([2, 3, 4], max_new_tokens=5, temperature=1.5,
                      top_k=10)
    engine.run()
    want = [int(t) for t in model.generate([2, 3, 4], max_new_tokens=5,
                                           use_cache=True)]
    assert g.tokens == want
    assert len(s.tokens) == 8 and all(0 <= t < 61 for t in s.tokens)


def test_engine_reuse_after_run(model):
    """The engine (and its compiled programs) is reusable across waves."""
    engine = InferenceEngine(model, slots=2)
    engine.submit([1, 2], max_new_tokens=4)
    first = engine.run()
    engine.submit([8, 9, 10], max_new_tokens=4)
    second = engine.run()
    assert len(first) == 1 and len(second) == 1
    want = [int(t) for t in model.generate([8, 9, 10], max_new_tokens=4,
                                           use_cache=True)]
    assert second[0].tokens == want


def test_multi_step_tick_token_exact(model):
    """steps_per_tick=4: each dispatch scans 4 decode steps per slot on
    device; greedy outputs stay token-exact vs generate and the dispatch
    count drops ~4x vs the single-step engine."""
    rng = np.random.default_rng(3)
    specs = [(list(rng.integers(1, 61, n)), m)
             for n, m in [(3, 9), (6, 12), (2, 5), (5, 11), (4, 7)]]
    engine = InferenceEngine(model, slots=2, steps_per_tick=4)
    reqs = [engine.submit(p, max_new_tokens=m) for p, m in specs]
    done = engine.run()
    assert len(done) == len(specs) and all(r.done for r in done)
    for req, (prompt, m) in zip(reqs, specs):
        want = [int(t) for t in model.generate(prompt, max_new_tokens=m,
                                               use_cache=True)]
        assert req.tokens == want, (req.tokens, want)

    single = InferenceEngine(model, slots=2)
    for p, m in specs:
        single.submit(p, max_new_tokens=m)
    single.run()
    assert engine.stats["step_dispatches"] * 3 < \
        single.stats["step_dispatches"], (engine.stats, single.stats)


def test_multi_step_tick_eos_trim(model):
    """A request hitting eos mid-block stops at eos (over-decoded device
    rows are discarded host-side) and its slot frees for the queue."""
    probe = model.generate([5, 9], max_new_tokens=4, use_cache=True)
    eos = int(probe[3])   # 2nd generated token => eos lands mid-block
    engine = InferenceEngine(model, slots=1, steps_per_tick=4)
    a = engine.submit([5, 9], max_new_tokens=10, eos_id=eos)
    b = engine.submit([3, 4, 5], max_new_tokens=6)
    done = engine.run()
    assert {r.id for r in done} == {a.id, b.id}
    assert a.tokens[-1] == eos and a.n_generated == 2
    want = [int(t) for t in model.generate([3, 4, 5], max_new_tokens=6,
                                           use_cache=True)]
    assert b.tokens == want
