"""Decode megakernel (ops/decode_stack.py) parity vs the unrolled XLA
decode step: same math, one pallas program for the whole layer stack.
Runs in interpret mode off-TPU (tests/conftest.py CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightgrad_tpu.models import GPT, GPTConfig
from lightgrad_tpu.ops import runtime


def _fns(model, mode):
    prev = runtime.set_kernel_mode(mode)
    try:
        return model._kv_functions()
    finally:
        runtime.set_kernel_mode(prev)


def _build(vocab=64, W=16, d=128, L=2, H=2, seed=0):
    np.random.seed(seed)
    return GPT(GPTConfig(vocab_size=vocab, n_positions=W, n_embd=d,
                         n_layer=L, n_head=H))


def test_megakernel_step_matches_xla_f32():
    model = _build()
    fx = _fns(model, "xla")
    fp = _fns(model, "pallas")
    assert "stack#slabs" in fp.step.params, "megakernel did not pack"
    assert "stack#slabs" not in fx.step.params

    W = model.cfg.n_positions
    prompt = np.array([3, 7, 11], np.int32)
    toks = jnp.asarray(np.pad(prompt, (0, W - len(prompt))))
    cache, lg0 = fx.prefill(fx.init_cache(), toks, len(prompt))

    cx, cp = cache, cache
    tok = jnp.int32(int(np.argmax(np.asarray(lg0))))
    for pos in range(len(prompt), len(prompt) + 6):
        cx, lx = fx.step(cx, jnp.int32(pos), tok)
        cp, lp = fp.step(cp, jnp.int32(pos), tok)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lx),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(cp), np.asarray(cx),
                                   rtol=2e-4, atol=2e-4)
        tok = jnp.int32(int(np.argmax(np.asarray(lx))))


def test_megakernel_first_token_pos0():
    """pos==0: no visible cache rows, self-attention only."""
    model = _build(seed=5)
    fx = _fns(model, "xla")
    fp = _fns(model, "pallas")
    cache = fx.init_cache()
    cx, lx = fx.step(cache, jnp.int32(0), jnp.int32(9))
    cp, lp = fp.step(cache, jnp.int32(0), jnp.int32(9))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lx),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(cp), np.asarray(cx),
                               rtol=2e-4, atol=2e-4)


def test_megakernel_int8_matches_xla_int8():
    import lightgrad_tpu as light

    model = _build(seed=2)
    light.amp.cast_module(model, jnp.bfloat16)
    model.quantize_serving()
    fx = _fns(model, "xla")
    fp = _fns(model, "pallas")
    assert "stack#scales" in fp.step.params

    cache = fx.init_cache()
    cx, lx = fx.step(cache, jnp.int32(0), jnp.int32(4))
    cp, lp = fp.step(cache, jnp.int32(0), jnp.int32(4))
    lx32 = np.asarray(lx, np.float32)
    lp32 = np.asarray(lp, np.float32)
    np.testing.assert_allclose(lp32, lx32, rtol=5e-2, atol=5e-2)
    assert int(np.argmax(lp32)) == int(np.argmax(lx32))


def test_megakernel_int8_kv_cache_matches_xla():
    """int8 KV cache THROUGH the megakernel (VERDICT r4 next #3): the
    kernel dequantizes cache rows in its score/context dots; the caller
    quantizes the emitted rows with the same formula the fallback uses.
    Logits within quantization tolerance (the kernel attends the new
    token's own row at full precision where the fallback attends its
    quantized image -- a bounded one-term difference); cache rows within
    one quantization unit, scales tight."""
    model = _build(seed=3)
    model.quantize_kv()
    fx = _fns(model, "xla")
    fp = _fns(model, "pallas")
    assert "stack#slabs" in fp.step.params, "megakernel did not pack"

    W = model.cfg.n_positions
    prompt = np.array([3, 7, 11], np.int32)
    toks = jnp.asarray(np.pad(prompt, (0, W - len(prompt))))
    cache, lg0 = fx.prefill(fx.init_cache(), toks, len(prompt))

    cx, cp = cache, cache
    tok = jnp.int32(int(np.argmax(np.asarray(lg0))))
    for pos in range(len(prompt), len(prompt) + 6):
        cx, lx = fx.step(cx, jnp.int32(pos), tok)
        cp, lp = fp.step(cp, jnp.int32(pos), tok)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lx),
                                   rtol=5e-3, atol=5e-3)
        qx, sx = (np.asarray(a) for a in cx)
        qp, sp = (np.asarray(a) for a in cp)
        assert np.max(np.abs(qx.astype(np.int32)
                             - qp.astype(np.int32))) <= 1
        # the full-precision-self-row difference perturbs the residual
        # stream entering LATER layers by ~one int8 quantization unit, so
        # their k/v rows (and row scales) drift at the same order -- a
        # bounded per-step effect, not an accumulating divergence (the
        # logits assertion above caps it end to end)
        np.testing.assert_allclose(sp, sx, rtol=1e-2, atol=1e-6)
        tok = jnp.int32(int(np.argmax(np.asarray(lx))))


def test_megakernel_int8_weights_and_int8_kv_compose():
    """quantize_serving + quantize_kv together (the long-context serving
    flagship): both scale paths thread through one kernel."""
    import lightgrad_tpu as light

    model = _build(seed=4)
    light.amp.cast_module(model, jnp.bfloat16)
    model.quantize_serving()
    model.quantize_kv()
    fx = _fns(model, "xla")
    fp = _fns(model, "pallas")
    assert "stack#scales" in fp.step.params
    assert "stack#slabs" in fp.step.params

    cache = fx.init_cache()
    cx, lx = fx.step(cache, jnp.int32(0), jnp.int32(4))
    cp, lp = fp.step(cache, jnp.int32(0), jnp.int32(4))
    lx32, lp32 = np.asarray(lx, np.float32), np.asarray(lp, np.float32)
    np.testing.assert_allclose(lp32, lx32, rtol=5e-2, atol=5e-2)
    assert int(np.argmax(lp32)) == int(np.argmax(lx32))


def test_megakernel_int8_kv_generation_runs():
    """generate_device end to end with the quantized cache through the
    megakernel (the scan carries the (int8, scales) pytree)."""
    model = _build(seed=8)
    model.quantize_kv()
    prev = runtime.set_kernel_mode("pallas")
    try:
        for a in ("_kv_fns", "_dev_gen"):
            if hasattr(model, a):
                delattr(model, a)
        out = model.generate_device([3, 1, 4], max_new_tokens=5)
    finally:
        runtime.set_kernel_mode(prev)
        for a in ("_kv_fns", "_dev_gen"):
            if hasattr(model, a):
                delattr(model, a)
    assert len(out) == 8
    assert all(0 <= t < 64 for t in out)


def test_megakernel_inside_scan_generation():
    """The whole generate_device loop over the megernel step: runs and
    matches the XLA-path generation logits at the first step (the scan
    carries cache + pos through the kernel)."""
    model = _build(seed=7)
    prev = runtime.set_kernel_mode("pallas")
    try:
        for a in ("_kv_fns", "_dev_gen"):
            if hasattr(model, a):
                delattr(model, a)
        out = model.generate_device([3, 1, 4], max_new_tokens=5)
    finally:
        runtime.set_kernel_mode(prev)
        for a in ("_kv_fns", "_dev_gen"):
            if hasattr(model, a):
                delattr(model, a)
    assert len(out) == 8
    assert all(0 <= t < 64 for t in out)


def _forced_chunks(monkeypatch, budget):
    from lightgrad_tpu.ops import decode_stack as ds
    monkeypatch.setattr(ds, "_VMEM_BUDGET", budget)
    return ds


def test_plan_chunks_picks_finer_chunking_under_budget():
    from lightgrad_tpu.ops import decode_stack as ds
    kw = dict(d=128, H=2, hd=64, NV=13, cache_dt=jnp.float32,
              w_dt=jnp.float32, int8=False, kvq=False, R=4)
    assert ds._plan_chunks(256, **kw) == 1
    # squeeze the budget: the full-window block no longer fits, chunks do
    c1 = ds._working_set_bytes(256, **kw)
    c2 = ds._working_set_bytes(128, **kw)
    assert c2 < c1
    import lightgrad_tpu.ops.decode_stack as mod
    old = mod._VMEM_BUDGET
    try:
        mod._VMEM_BUDGET = (c1 + c2) // 2
        assert mod._plan_chunks(256, **kw) == 2
        mod._VMEM_BUDGET = c2 // 4
        # W=256 only divides into 128-lane chunks once -> no fit
        assert mod._plan_chunks(256, **kw) is None
    finally:
        mod._VMEM_BUDGET = old


def test_megakernel_chunked_window_matches_xla(monkeypatch):
    """Force C=2 cache chunks (online-softmax recurrence + chunk-skip
    index maps) and check parity against the unrolled step at positions
    BELOW the chunk boundary (chunk 1 skipped entirely) and positions
    crossing it (both chunks live)."""
    from lightgrad_tpu.ops import decode_stack as ds
    kw = dict(d=128, H=2, hd=64, NV=13, cache_dt=jnp.float32,
              w_dt=jnp.float32, int8=False, kvq=False, R=4)
    budget = (ds._working_set_bytes(256, **kw)
              + ds._working_set_bytes(128, **kw)) // 2
    monkeypatch.setattr(ds, "_VMEM_BUDGET", budget)
    assert ds._plan_chunks(256, **kw) == 2

    model = _build(vocab=64, W=256, d=128, L=2, H=2, seed=11)
    fx = _fns(model, "xla")
    fp = _fns(model, "pallas")
    assert "stack#slabs" in fp.step.params, "megakernel did not pack"

    W = model.cfg.n_positions
    rng = np.random.RandomState(0)
    prompt = rng.randint(0, 64, size=126).astype(np.int32)
    toks = jnp.asarray(np.pad(prompt, (0, W - len(prompt))))
    cache, lg0 = fx.prefill(fx.init_cache(), toks, len(prompt))

    cx, cp = cache, cache
    tok = jnp.int32(int(np.argmax(np.asarray(lg0))))
    # pos 126..133: crosses the Wc=128 boundary mid-run
    for pos in range(len(prompt), len(prompt) + 8):
        cx, lx = fx.step(cx, jnp.int32(pos), tok)
        cp, lp = fp.step(cp, jnp.int32(pos), tok)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lx),
                                   rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(np.asarray(cp), np.asarray(cx),
                                   rtol=5e-4, atol=5e-4)
        tok = jnp.int32(int(np.argmax(np.asarray(lx))))


def test_megakernel_chunked_int8_kv_matches_xla(monkeypatch):
    """Chunked window COMPOSED with the int8 KV cache: lane-major scale
    blocks, dequant on the score/probability rows, chunk skipping."""
    from lightgrad_tpu.ops import decode_stack as ds
    kw = dict(d=128, H=2, hd=64, NV=13, cache_dt=jnp.int8,
              w_dt=jnp.float32, int8=False, kvq=True, R=4)
    budget = (ds._working_set_bytes(256, **kw)
              + ds._working_set_bytes(128, **kw)) // 2
    monkeypatch.setattr(ds, "_VMEM_BUDGET", budget)
    assert ds._plan_chunks(256, **kw) == 2

    model = _build(vocab=64, W=256, d=128, L=2, H=2, seed=12)
    model.quantize_kv()
    fx = _fns(model, "xla")
    fp = _fns(model, "pallas")
    assert "stack#slabs" in fp.step.params

    W = model.cfg.n_positions
    rng = np.random.RandomState(1)
    prompt = rng.randint(0, 64, size=126).astype(np.int32)
    toks = jnp.asarray(np.pad(prompt, (0, W - len(prompt))))
    cache, lg0 = fx.prefill(fx.init_cache(), toks, len(prompt))

    cx, cp = cache, cache
    tok = jnp.int32(int(np.argmax(np.asarray(lg0))))
    for pos in range(len(prompt), len(prompt) + 6):
        cx, lx = fx.step(cx, jnp.int32(pos), tok)
        cp, lp = fp.step(cp, jnp.int32(pos), tok)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lx),
                                   rtol=5e-3, atol=5e-3)
        qx, _ = (np.asarray(a) for a in cx)
        qp, _ = (np.asarray(a) for a in cp)
        assert np.max(np.abs(qx.astype(np.int32)
                             - qp.astype(np.int32))) <= 1
        tok = jnp.int32(int(np.argmax(np.asarray(lx))))


def test_megakernel_unfittable_window_falls_back(monkeypatch):
    """When no chunking fits the budget, pack_gpt_stack is skipped and
    the unrolled path serves the step (no compile-time VMEM error)."""
    from lightgrad_tpu.ops import decode_stack as ds
    monkeypatch.setattr(ds, "_VMEM_BUDGET", 1)
    model = _build(seed=13)
    fp = _fns(model, "pallas")
    assert "stack#slabs" not in fp.step.params
    cache = fp.init_cache()
    _, lg = fp.step(cache, jnp.int32(0), jnp.int32(3))
    assert np.asarray(lg).shape == (64,)


def test_megakernel_extend_matches_sequential_steps():
    """Multi-row megakernel (n=4 extend): logits and cache mutations match
    the sequential single-token megakernel steps AND the unrolled XLA
    extend (the in-kernel (n, n) causal self-block must reproduce the
    write-then-attend semantics exactly)."""
    model = _build(vocab=64, W=64, d=128, L=2, H=2, seed=21)
    fx = _fns(model, "xla")
    fp = _fns(model, "pallas")
    assert "stack#slabs" in fp.step.params

    W = model.cfg.n_positions
    prompt = np.array([3, 7, 11, 2, 40], np.int32)
    toks = jnp.asarray(np.pad(prompt, (0, W - len(prompt))))
    cache, _ = fx.prefill(fx.init_cache(), toks, len(prompt))

    chunk = jnp.asarray(np.array([5, 9, 1, 44], np.int32))
    pos0 = jnp.int32(len(prompt))

    seq_cache, seq_rows = cache, []
    for i in range(len(chunk)):
        seq_cache, lg = fp.step(seq_cache, pos0 + i, chunk[i])
        seq_rows.append(np.asarray(lg))
    ext_cache, ext_rows = fp.extend(cache, pos0, chunk)
    xla_cache, xla_rows = fx.extend(cache, pos0, chunk)

    np.testing.assert_allclose(np.asarray(ext_rows), np.stack(seq_rows),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(ext_cache), np.asarray(seq_cache),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(ext_rows), np.asarray(xla_rows),
                               rtol=5e-4, atol=5e-4)


def test_megakernel_extend_chunked_window(monkeypatch):
    """n=5 extend through a C=2-chunked window, rows straddling the chunk
    boundary (pos0=126, Wc=128)."""
    from lightgrad_tpu.ops import decode_stack as ds
    kw = dict(d=128, H=2, hd=64, NV=13, cache_dt=jnp.float32,
              w_dt=jnp.float32, int8=False, kvq=False, R=4, n=8)
    budget = (ds._working_set_bytes(256, **kw)
              + ds._working_set_bytes(128, **kw)) // 2
    monkeypatch.setattr(ds, "_VMEM_BUDGET", budget)
    assert ds._plan_chunks(256, **kw) == 2

    model = _build(vocab=64, W=256, d=128, L=2, H=2, seed=22)
    fx = _fns(model, "xla")
    fp = _fns(model, "pallas")
    assert "stack#slabs" in fp.step.params

    W = model.cfg.n_positions
    rng = np.random.RandomState(5)
    prompt = rng.randint(0, 64, size=126).astype(np.int32)
    toks = jnp.asarray(np.pad(prompt, (0, W - len(prompt))))
    cache, _ = fx.prefill(fx.init_cache(), toks, len(prompt))

    chunk = jnp.asarray(rng.randint(0, 64, size=5).astype(np.int32))
    pos0 = jnp.int32(len(prompt))
    ext_cache, ext_rows = fp.extend(cache, pos0, chunk)
    xla_cache, xla_rows = fx.extend(cache, pos0, chunk)
    np.testing.assert_allclose(np.asarray(ext_rows), np.asarray(xla_rows),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(ext_cache), np.asarray(xla_cache),
                               rtol=5e-4, atol=5e-4)


def test_megakernel_extend_int8_kv():
    """n=4 extend composed with the int8 KV cache: emitted rows quantize
    to the same cache contents as the unrolled path (+/- 1 int8 unit from
    the full-precision self-block)."""
    model = _build(vocab=64, W=64, d=128, L=2, H=2, seed=23)
    model.quantize_kv()
    fx = _fns(model, "xla")
    fp = _fns(model, "pallas")
    assert "stack#slabs" in fp.step.params

    W = model.cfg.n_positions
    prompt = np.array([3, 7, 11], np.int32)
    toks = jnp.asarray(np.pad(prompt, (0, W - len(prompt))))
    cache, _ = fx.prefill(fx.init_cache(), toks, len(prompt))

    chunk = jnp.asarray(np.array([5, 9, 1, 44], np.int32))
    pos0 = jnp.int32(len(prompt))
    ext_cache, ext_rows = fp.extend(cache, pos0, chunk)
    xla_cache, xla_rows = fx.extend(cache, pos0, chunk)
    np.testing.assert_allclose(np.asarray(ext_rows), np.asarray(xla_rows),
                               rtol=5e-2, atol=5e-2)
    qx, _ = (np.asarray(a) for a in xla_cache)
    qp, _ = (np.asarray(a) for a in ext_cache)
    assert np.max(np.abs(qx.astype(np.int32) - qp.astype(np.int32))) <= 1


def test_speculative_device_through_megakernel():
    """generate_speculative_device with BOTH models on the megakernel path
    (pallas mode): greedy output identical to megakernel plain decode."""
    target = _build(vocab=64, W=64, d=128, L=2, H=2, seed=24)
    draft = _build(vocab=64, W=64, d=128, L=1, H=2, seed=25)
    from lightgrad_tpu.models.decoding import generate_speculative_device

    prev = runtime.set_kernel_mode("pallas")
    try:
        for m in (target, draft):
            for a in ("_kv_fns", "_dev_gen", "_dev_spec"):
                if hasattr(m, a):
                    delattr(m, a)
        ids = [3, 1, 4, 1, 5]
        want = target.generate_device(ids, max_new_tokens=10)
        got = generate_speculative_device(target, draft, ids,
                                          max_new_tokens=10, k=3)
        assert got == want, (got, want)
        assert "stack#slabs" in target._kv_fns.step.params
    finally:
        runtime.set_kernel_mode(prev)
        for m in (target, draft):
            for a in ("_kv_fns", "_dev_gen", "_dev_spec"):
                if hasattr(m, a):
                    delattr(m, a)


def test_batched_step_matches_vmapped_single():
    """decode_stack_batch (B slots, ONE weight stream) vs the vmap lift of
    the single-slot megakernel step: logits and caches identical."""
    model = _build(vocab=64, W=64, d=128, L=2, H=2, seed=31)
    fp = _fns(model, "pallas")
    assert fp.step_batch is not None

    B, W = 3, model.cfg.n_positions
    rng = np.random.RandomState(0)
    lens = [3, 7, 5]
    c0 = fp.init_cache()
    cs = []
    for b in range(B):
        toks = jnp.asarray(np.pad(rng.randint(0, 64, lens[b]).astype(
            np.int32), (0, W - lens[b])))
        cb, _ = fp.prefill(c0, toks, lens[b])
        cs.append(cb)
    caches = jnp.stack(cs)
    poss = jnp.asarray(np.array(lens, np.int32))
    toks = jnp.asarray(rng.randint(0, 64, B).astype(np.int32))
    cv, lv = jax.vmap(fp.step.fn, in_axes=(None, 0, 0, 0))(
        fp.step.params, caches, poss, toks)
    cb_, lb = fp.step_batch(caches, poss, toks)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(lv),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(cb_), np.asarray(cv),
                               rtol=5e-4, atol=5e-4)


def test_batched_step_chunked_and_int8_kv(monkeypatch):
    """Batched kernel with a chunked window AND the int8 KV cache: the
    per-slot chunk-skip masking must hold when slots straddle different
    chunks (pos 100 vs 140 of Wc=128)."""
    from lightgrad_tpu.ops import decode_stack as ds
    kw = dict(d=128, H=2, hd=64, NV=13, cache_dt=jnp.int8,
              w_dt=jnp.float32, int8=False, kvq=True, R=4, n=2, batch=2)
    budget = (ds._working_set_bytes(256, **kw)
              + ds._working_set_bytes(128, **kw)) // 2
    monkeypatch.setattr(ds, "_VMEM_BUDGET", budget)
    assert ds._plan_chunks(256, **kw) == 2

    model = _build(vocab=64, W=256, d=128, L=2, H=2, seed=32)
    model.quantize_kv()
    fp = _fns(model, "pallas")
    assert fp.step_batch is not None

    B, W = 2, model.cfg.n_positions
    rng = np.random.RandomState(1)
    lens = [100, 140]
    c0 = fp.init_cache()
    cqs, css = [], []
    for b in range(B):
        toks = jnp.asarray(np.pad(rng.randint(0, 64, lens[b]).astype(
            np.int32), (0, W - lens[b])))
        cb, _ = fp.prefill(c0, toks, lens[b])
        cqs.append(cb[0])
        css.append(cb[1])
    caches = (jnp.stack(cqs), jnp.stack(css))
    poss = jnp.asarray(np.array(lens, np.int32))
    toks = jnp.asarray(rng.randint(0, 64, B).astype(np.int32))
    cv, lv = jax.vmap(fp.step.fn, in_axes=(None, (0, 0), 0, 0))(
        fp.step.params, caches, poss, toks)
    cb_, lb = fp.step_batch(caches, poss, toks)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(lv),
                               rtol=5e-3, atol=5e-3)
    assert np.max(np.abs(np.asarray(cb_[0]).astype(np.int32)
                         - np.asarray(cv[0]).astype(np.int32))) <= 1


def test_batch_generation_through_batched_kernel():
    """generate_batch_device routes through the native batched program and
    produces the same tokens as the per-slot single-stream decode."""
    model = _build(vocab=64, W=64, d=128, L=2, H=2, seed=33)
    prev = runtime.set_kernel_mode("pallas")
    try:
        for a in ("_kv_fns", "_dev_gen", "_dev_gen_batch"):
            if hasattr(model, a):
                delattr(model, a)
        prompts = [[3, 1, 4], [1, 5, 9, 2], [6]]
        outs = model.generate_batch_device(prompts, max_new_tokens=6)
        singles = [model.generate_device(p, max_new_tokens=6)
                   for p in prompts]
        assert outs == singles, (outs, singles)
    finally:
        runtime.set_kernel_mode(prev)
        for a in ("_kv_fns", "_dev_gen", "_dev_gen_batch"):
            if hasattr(model, a):
                delattr(model, a)


def test_serving_engine_uses_batched_step():
    """InferenceEngine ticks through the batched megakernel program and
    still satisfies its request contract."""
    import lightgrad_tpu as light
    from lightgrad_tpu.serving import InferenceEngine

    model = _build(vocab=64, W=64, d=128, L=2, H=2, seed=34)
    prev = runtime.set_kernel_mode("pallas")
    try:
        for a in ("_kv_fns",):
            if hasattr(model, a):
                delattr(model, a)
        eng = InferenceEngine(model, slots=2, steps_per_tick=4)
        assert eng._step_batch_fn is not None
        reqs = [eng.submit([3, 1, 4], 6), eng.submit([1, 5], 9),
                eng.submit([7, 7, 7, 7], 5)]
        done = eng.run()
        assert len(done) == 3
        assert all(r.n_generated == r.max_new_tokens for r in reqs)
        assert all(0 <= t < 64 for r in reqs for t in r.tokens)
    finally:
        runtime.set_kernel_mode(prev)
        for a in ("_kv_fns",):
            if hasattr(model, a):
                delattr(model, a)
