"""Continuous-batching inference engine over compiled KV-cache decoding.

Dynamic serving traffic (ragged arrivals, ragged lengths) is the worst case
for an XLA-compiled decode loop: naive batching pads every request to the
longest in its batch and stalls new arrivals until the batch drains.  This
engine applies the continuous-batching design (Orca, OSDI'22; vLLM) the
TPU-native way: a FIXED number of decode slots -- so every device program
has a single static shape and compiles exactly once -- with per-slot
admission/retirement driven from the host between dispatches.

* One stacked cache array ``(slots, ...)`` holds every in-flight request;
  "admitting" a request is a compiled prefill into its slot
  (``dynamic_update_slice`` on the stacked cache), "retiring" is free.
* Every engine tick advances ALL slots with ONE vmapped one-token program
  (the same compiled step regardless of arrival pattern); finished or empty
  slots harmlessly rewrite their last cache row (masked by ``<= pos``).
* Sampling runs ON DEVICE inside the tick program when every in-flight
  request shares one (temperature, top_k, top_p) signature (the normal
  serving configuration): the tick reads back ``slots`` int32 tokens
  instead of a (slots, vocab) logits matrix -- through a tunneled chip the
  logits readback, not compute, dominated the tick (measured ~12 ms/tick
  on GPT-2-small batch-8 in r3).  Mixed per-request hyperparameters fall
  back to host-side sampling transparently (token-exact, just slower).

Works with any model exposing the ``_kv_functions`` contract (GPT, Llama/
Mistral/Qwen/Gemma, Mixtral, T5 decoder via its own wrapper).  No reference
counterpart (the reference has no serving surface at all).
"""

import numpy as np

__all__ = ["Request", "InferenceEngine"]


class Request:
    """One generation request and its (growing) result."""

    _next_id = 0

    def __init__(self, prompt, max_new_tokens: int, temperature: float = 0.0,
                 top_k: int = 0, top_p: float = 0.0, eos_id: int = None):
        self.id = Request._next_id
        Request._next_id += 1
        self.prompt = [int(t) for t in prompt]
        self.max_new_tokens = int(max_new_tokens)
        self.temperature = temperature
        self.top_k, self.top_p = top_k, top_p
        self.eos_id = eos_id
        self.tokens = list(self.prompt)   # prompt + generated
        self.done = False

    @property
    def n_generated(self):
        return len(self.tokens) - len(self.prompt)


class InferenceEngine:
    """Slot-based continuous batching over a ``_kv_functions`` model.

    ``slots`` is the max number of concurrently decoding requests -- a
    compile-time constant (one vmapped step program of batch ``slots``).
    ``submit()`` any number of requests, then ``run()``; requests are
    admitted the moment a slot frees up, so short requests don't wait for
    long ones and arrival order never pads anyone.
    """

    def __init__(self, model, slots: int = 8, rng=None,
                 steps_per_tick: int = 1):
        import jax
        import jax.numpy as jnp

        self.model = model
        self.slots = slots
        # steps_per_tick > 1: each tick dispatch runs a lax.scan of S decode
        # steps for every slot (device-sampled path only).  Through the
        # tunnel one program dispatch costs ~1.2 ms regardless of content
        # (benchmarks/gemv_chain_probe.py tiny-chain), so S amortizes the
        # floor S-fold at the cost of admitting new requests every S tokens.
        # Slots that finish mid-block keep decoding garbage rows; the host
        # trims at eos/max_new and retirement re-prefills the slot's cache.
        self.steps_per_tick = max(1, int(steps_per_tick))
        self.rng = rng or np.random.default_rng(0)
        cfg = model.cfg
        self.window = (getattr(cfg, "n_positions", None)
                       or cfg.max_position_embeddings)
        if not hasattr(model, "_kv_fns"):
            model._kv_fns = model._kv_functions()
        init_cache, prefill, step = model._kv_fns
        c0 = init_cache()
        # cache may be a pytree (int8 KV cache = (rows, scales)): stack and
        # slot-update per leaf
        self._caches = jax.tree_util.tree_map(
            lambda a: jnp.zeros((slots,) + a.shape, a.dtype), c0)

        # compiled once each: slot admission (prefill + stacked-cache write)
        # and the all-slots decode tick.  Params enter as runtime arguments
        # (decoding.ParamFn contract) -- composing via .fn keeps the weights
        # out of the serialized programs
        @jax.jit
        def admit_impl(p, caches, slot, toks, n_real):
            fresh = jax.tree_util.tree_map(
                lambda a: jnp.zeros(a.shape, a.dtype), c0)
            cache, logits = prefill.fn(p, fresh, toks, n_real)
            return jax.tree_util.tree_map(
                lambda cs, c: cs.at[slot].set(c), caches, cache), logits

        self._admit = lambda *a: admit_impl(prefill.params, *a)
        # native batched step when the model provides one (all slots share
        # ONE weight stream -- ops/decode_stack.decode_stack_batch);
        # vmap-of-step re-streams weights per slot and is the fallback
        step_batch = getattr(model._kv_fns, "step_batch", None)
        if step_batch is not None:
            bstep_impl = jax.jit(step_batch.fn)
        else:
            bstep_impl = jax.jit(jax.vmap(step.fn, in_axes=(None, 0, 0, 0)))
        self._bstep = lambda *a: bstep_impl(step.params, *a)
        # device-sampled tick programs, one per (temp, top_k, top_p)
        # signature; per-slot PRNG keys live on device across ticks
        self._tick_fns = {}
        self._keys = jnp.stack([jax.random.PRNGKey(i) for i in range(slots)])
        self._step_fn, self._step_params = step.fn, step.params
        self._step_batch_fn = None if step_batch is None else step_batch.fn

        self._active = [None] * slots     # slot -> Request | None
        self._queue = []
        self._finished = []
        # instrumentation: continuous batching's win is fewer step dispatches
        self.stats = {"step_dispatches": 0, "prefills": 0,
                      "tokens_generated": 0, "slot_tokens": 0}

    # ------------------------------------------------------------------ API
    def submit(self, prompt, max_new_tokens: int, **kw) -> Request:
        req = Request(prompt, max_new_tokens, **kw)
        assert len(req.prompt) + req.max_new_tokens <= self.window, (
            f"prompt+new must fit the window "
            f"({len(req.prompt)}+{req.max_new_tokens} > {self.window})")
        self._queue.append(req)
        return req

    @property
    def pending(self) -> int:
        return len(self._queue) + sum(r is not None for r in self._active)

    def run(self):
        """Drive until every submitted request is finished; returns the
        finished requests in completion order."""
        while self.pending:
            self.tick()
        out, self._finished = self._finished, []
        return out

    # ------------------------------------------------------------ engine
    def tick(self):
        """One engine iteration: admit into free slots, then one vmapped
        decode step across all slots."""
        import jax.numpy as jnp

        from lightgrad_tpu.models.gpt import _sample as sample_one

        # --- admission: fill every free slot from the queue --------------
        for slot in range(self.slots):
            if self._active[slot] is not None or not self._queue:
                continue
            req = self._queue.pop(0)
            toks = np.zeros(self.window, np.int32)
            toks[: len(req.prompt)] = req.prompt
            self._caches, logits = self._admit(
                self._caches, jnp.int32(slot), jnp.asarray(toks),
                jnp.int32(len(req.prompt)))
            self.stats["prefills"] += 1
            nxt = int(sample_one(np.asarray(logits), req.temperature,
                                 self.rng, top_k=req.top_k, top_p=req.top_p))
            req.tokens.append(nxt)
            self.stats["tokens_generated"] += 1
            if self._is_finished(req):
                req.done = True
                self._finished.append(req)
            else:
                self._active[slot] = req

        if not any(r is not None for r in self._active):
            return

        # --- decode: ONE compiled step for every slot ---------------------
        pos = np.zeros(self.slots, np.int32)
        tok = np.zeros(self.slots, np.int32)
        for slot, req in enumerate(self._active):
            if req is not None:
                pos[slot] = len(req.tokens) - 1
                tok[slot] = req.tokens[-1]

        sigs = {(r.temperature, r.top_k, r.top_p)
                for r in self._active if r is not None}
        if len(sigs) == 1:
            # homogeneous sampling config: sample ON DEVICE, read back a
            # (slots, steps) int32 block instead of (slots, vocab) logits.
            # Steps beyond a request's eos/max_new decode garbage rows into
            # clamped/retiring cache positions -- harmless because the host
            # stops appending at the finish condition and a freed slot is
            # fully re-prefilled before reuse (every valid token's K/V write
            # lands in bounds: submit() asserts prompt+max_new <= window).
            steps = self.steps_per_tick
            sig = next(iter(sigs))
            fn = self._tick_fns.get(sig)
            if fn is None:
                fn = self._tick_fns[sig] = self._tick_program(sig, steps)
            self._caches, toks, self._keys = fn(
                self._step_params, self._caches, jnp.asarray(pos),
                jnp.asarray(tok), self._keys)
            tokmat = np.asarray(toks)                       # (slots, steps)
        else:
            steps = 1
            self._caches, logits = self._bstep(
                self._caches, jnp.asarray(pos), jnp.asarray(tok))
            lg = np.asarray(logits)
            tokmat = np.array([[
                sample_one(lg[s], r.temperature, self.rng,
                           top_k=r.top_k, top_p=r.top_p)
                if r is not None else 0]
                for s, r in enumerate(self._active)], np.int64)
        self.stats["step_dispatches"] += 1
        self.stats["slot_tokens"] += self.slots * steps
        for slot, req in enumerate(self._active):
            if req is None:
                continue
            for i in range(steps):
                req.tokens.append(int(tokmat[slot, i]))
                self.stats["tokens_generated"] += 1
                if self._is_finished(req):
                    req.done = True
                    self._finished.append(req)
                    self._active[slot] = None   # slot frees for next tick
                    break

    def _tick_program(self, sig, steps):
        """Compiled all-slots decode tick with ON-DEVICE sampling for one
        (temperature, top_k, top_p) signature: a ``lax.scan`` of ``steps``
        decode steps per slot in ONE dispatch; per-slot PRNG keys thread
        through the program (models/decoding.py::_device_sample math)."""
        import jax

        from .models.decoding import _device_sample

        temp, tk, tp = sig
        step_fn = self._step_fn
        sb_fn = self._step_batch_fn

        if sb_fn is not None:
            # native batched tick: every scanned step advances ALL slots
            # through ONE weight stream (decode_stack_batch); sampling
            # stays per-slot via vmap over (logits row, key)
            def allslots(p, caches, poss, toks, keys):
                def body(carry, _):
                    caches, poss, toks, keys = carry
                    caches, logits = sb_fn(p, caches, poss, toks)
                    splits = jax.vmap(jax.random.split)(keys)
                    keys, subs = splits[:, 0], splits[:, 1]
                    nxt = jax.vmap(
                        lambda lg, k: _device_sample(lg, k, temp, tk, tp))(
                        logits, subs)
                    return (caches, poss + 1, nxt, keys), nxt

                (caches, _, _, keys), toks = jax.lax.scan(
                    body, (caches, poss, toks, keys), None, length=steps)
                # (steps, slots) -> (slots, steps) to match the vmapped
                # single-slot program's output layout
                return caches, toks.T, keys

            return jax.jit(allslots)

        def one(p, cache, pos, tok, key):
            def body(carry, _):
                cache, pos, tok, key = carry
                cache, logits = step_fn(p, cache, pos, tok)
                key, sub = jax.random.split(key)
                nxt = _device_sample(logits, sub, temp, tk, tp)
                return (cache, pos + 1, nxt, key), nxt

            (cache, _, _, key), toks = jax.lax.scan(
                body, (cache, pos, tok, key), None, length=steps)
            return cache, toks, key

        return jax.jit(jax.vmap(one, in_axes=(None, 0, 0, 0, 0)))

    @staticmethod
    def _is_finished(req) -> bool:
        if req.eos_id is not None and req.tokens[-1] == req.eos_id:
            return True
        return req.n_generated >= req.max_new_tokens
