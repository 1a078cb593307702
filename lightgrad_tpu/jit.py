"""The step compiler: fuse an eager-tape function into one XLA program.

This is the TPU-native answer to the eager-dispatch-overhead hazard called out
in SURVEY.md §7 ("hard parts" #2): the reference launches one (blocking)
kernel per tape op -- ~8 launches *per parameter* inside its optimizers -- so
small-model training is dispatch-bound.  ``lightgrad_tpu.jit`` records which
tensors a step function reads, writes and creates, then re-traces it under
``jax.jit`` so the *entire* step (forward, backward graph walk, optimizer
update) compiles into a single fused XLA executable with donated parameter
buffers.

Usage::

    step = light.jit(lambda x, y: train_step(model, optim, x, y))
    for x, y in data:
        loss = step(x, y)          # one XLA dispatch per step

Contract for the wrapped function:
* tensor arguments are positional ``TpuTensor``s; shapes may vary (each new
  shape signature records + compiles once);
* parameters/optimizer state may be read from closures -- they are captured
  automatically and passed as runtime inputs (never baked as constants);
* no host synchronization inside (``.numpy()`` / ``.item()`` on interior
  tensors will fail under tracing -- call them on the returned tensors);
* python-level state must live in tensors (our optimizers comply).

The first call per signature discovers the read/write/capture sets by
ABSTRACT tracing (``jax.eval_shape`` -- no array math runs), then traces,
compiles and dispatches the real first step as the compiled program;
subsequent calls dispatch the compiled program and write mutated buffers
back into the original tensor objects.  ``LIGHTGRAD_RECORD=eager`` restores
the round-2 behavior (first call runs a real eager step on the host backend
while recording; the second call compiles).
"""

import weakref

import jax

from .autograd import tensor as _tensor_mod
from .autograd.tpu.tensor import TpuTensor

__all__ = ["jit", "invalidate_captures"]

# bumped whenever user code rebinds a tensor a compiled step may have
# captured by object identity (e.g. ``model.w = Tensor(...)`` -- see
# nn.Module.register_param_or_module).  Compiled steps snapshot the epoch at
# record time and re-record when it moves: the value-epoch drift guard.
_capture_epoch = 0


def invalidate_captures():
    """Mark all captured-by-identity jit programs stale (cheap, global)."""
    global _capture_epoch
    _capture_epoch += 1


class _AbstractDiscoveryError(RuntimeError):
    """Abstract (eval_shape) discovery itself failed -- the one case where
    falling back to eager recording can help.  Compile/run errors (e.g. a
    device RESOURCE_EXHAUSTED: the program genuinely does not fit) propagate
    unchanged: re-recording eagerly would grind for minutes and then hit the
    same wall."""


class _Recorder:
    """Observes tensor reads/writes/creations during the recording step.

    On TPU, reads of device-resident buffers are *staged to the host CPU
    backend* for the duration of the recording, so the one-time eager warmup
    step compiles its ~N-per-op programs locally instead of through the
    (potentially slow, e.g. tunneled) accelerator compiler.  Mutated buffers
    are pushed back to their original device/sharding afterwards.
    """

    def __init__(self, stage_to_cpu=False, abstract=False):
        self.reads = {}
        self.writes = {}
        self.created = set()
        self.staged = {}        # id(tensor) -> cpu copy of its original buffer
        self.orig_place = {}    # id(tensor) -> original sharding
        self.abstract = abstract
        self.arg_ids = frozenset()
        # abstract mode: pre-write snapshots of pre-existing tensors
        # (id -> (data, ctx, host_value)) and weakrefs to tensors created
        # during discovery (their post-discovery tracers must be sanitized)
        self.pre_write = {}
        self.created_refs = weakref.WeakValueDictionary()
        self.cpu = None
        if stage_to_cpu:
            try:
                self.cpu = jax.devices("cpu")[0]
            except RuntimeError:
                pass

    def on_read(self, t):
        self.reads.setdefault(id(t), t)
        d = t._raw_data()
        if self.cpu is not None and isinstance(d, jax.Array):
            if next(iter(d.devices())).platform != "cpu":
                cached = self.staged.get(id(t))
                if cached is None or cached[0] is not d:
                    self.orig_place.setdefault(id(t), d.sharding)
                    # host-born tensors (params, device datasets) keep their
                    # numpy copy -- rebuild the CPU buffer locally instead of
                    # pulling the device array back over the device link
                    # (through the tunneled chip that pull runs at ~MB/s and
                    # dominated big-model recording: 124M params ~= 13 min)
                    hv = getattr(t, "_host_value", None)
                    src = hv if hv is not None else d
                    cached = (d, jax.device_put(src, self.cpu))
                    self.staged[id(t)] = cached
                return cached[1]
        return d

    def on_write(self, t):
        # called BEFORE the buffer swap (tensor._set_data), so in abstract
        # mode the first write of a pre-existing tensor can snapshot the
        # value discovery is about to clobber with a tracer
        if id(t) not in self.writes:
            self.writes[id(t)] = t
            if (self.abstract and id(t) not in self.created
                    and id(t) not in self.arg_ids):
                self.pre_write[id(t)] = (
                    t._raw_data(), t.ctx, getattr(t, "_host_value", None))

    def on_create(self, t):
        self.created.add(id(t))
        if self.abstract:
            self.created_refs[id(t)] = t

    def sanitize_created(self):
        """Replace dead tracers left in still-referenced tensors created
        during abstract discovery (p.grad buffers and the like) with
        concrete zeros -- the same post-zero_grad state an eager first step
        leaves behind.  Call after dropping ``reads`` so discovery
        intermediates are freed instead of materialized."""
        import jax.numpy as jnp
        from jax.core import Tracer

        for t in list(self.created_refs.values()):
            d = t._raw_data()
            if isinstance(d, Tracer):
                t._swap_data_raw(jnp.zeros(d.shape, d.dtype))
                t._set_ctx(None)

    def restore_devices(self):
        """Move buffers written during recording back to their device."""
        if self.cpu is None:
            return
        for tid, t in self.writes.items():
            d = t._raw_data()
            if isinstance(d, jax.Array) and next(iter(d.devices())).platform == "cpu":
                place = self.orig_place.get(tid)
                if place is not None:
                    t._set_data(jax.device_put(d, place))
                else:
                    t._set_data(jax.device_put(d, jax.devices()[0]))


class _TraceScope:
    def __init__(self, recorder):
        self.recorder = recorder

    def __enter__(self):
        self.prev = _tensor_mod._trace
        _tensor_mod._trace = self.recorder
        return self.recorder

    def __exit__(self, *exc):
        _tensor_mod._trace = self.prev
        return False


def _is_tensor(x):
    return isinstance(x, TpuTensor)


class _CompiledStep:
    def __init__(self, fn):
        self.fn = fn
        self.cache = {}  # shape signature -> state dict

    def _signature(self, args):
        return tuple(
            (t.shape, str(t.dtype)) if _is_tensor(t) else ("static", repr(t))
            for t in args
        )

    def __call__(self, *args):
        sig = self._signature(args)
        state = self.cache.get(sig)
        if state is None:
            return self._record(sig, args)
        if state["compiled"] is None:
            self._compile(state, args)
        return self._run(state, args)

    # -- phase 1: discover reads/writes/captures -----------------------------
    def _record(self, sig, args):
        import os

        # abstract discovery (default): trace fn under jax.eval_shape -- zero
        # FLOPs, zero per-op compiles.  Anything it cannot handle (concrete
        # value inspection inside fn) would also fail the phase-2 jax.jit
        # trace, so it imposes no NEW constraint; the eager path remains for
        # debugging (LIGHTGRAD_RECORD=eager) and as an automatic fallback.
        if os.environ.get("LIGHTGRAD_RECORD", "abstract") == "abstract":
            try:
                return self._record_abstract(sig, args)
            except _AbstractDiscoveryError as e:
                # state restored by _record_abstract
                import warnings

                cause = e.__cause__ or e
                warnings.warn(
                    "abstract recording failed "
                    f"({type(cause).__name__}: {cause}); "
                    "falling back to eager recording "
                    "(set LIGHTGRAD_RECORD=eager to silence)")
        return self._record_eager(sig, args)

    def _finish_record(self, sig, rec, args):
        """Build the per-signature state dict from a completed discovery."""
        arg_ids = {id(t) for t in args if _is_tensor(t)}
        captured = [
            t
            for tid, t in rec.reads.items()
            if tid not in rec.created and tid not in arg_ids
        ]
        mutated = [
            t for tid, t in rec.writes.items() if tid not in rec.created
        ]
        state = {
            "captured": captured,
            "mutated": mutated,
            # ALL written tensors, including ones created during recording
            # that persist as object state (e.g. p.grad buffers attached to
            # params): tracing overwrites their data with tracers, and they
            # are not in the swap list, so the trace must restore them too
            # or the next eager step reads a leaked tracer
            "written": list(rec.writes.values()),
            "compiled": None,
            "epoch": _capture_epoch,
        }
        self.cache[sig] = state
        return state

    # -- phase 1, abstract mode: eval_shape discovery ------------------------
    def _record_abstract(self, sig, args):
        """Discover the read/write/capture sets by ABSTRACT tracing.

        ``jax.eval_shape`` runs fn with shape/dtype tracers standing in for
        the tensor arguments: the whole tape (forward, backward walk,
        optimizer update) executes as Python, but no array math runs and no
        per-op XLA program is built.  Pre-existing state written during
        discovery is snapshot-restored; the REAL first step is then the
        compiled program itself (device numerics, not a host emulation).
        Measured motivation: the eager recording of a GPT-2 124M AMP step
        costs ~12 min of XLA:CPU compute+compiles (~19 min through the
        tunneled chip even with host-mirrored params); abstract discovery is
        seconds.
        """
        rec = _Recorder(stage_to_cpu=False, abstract=True)
        tensor_args = [t for t in args if _is_tensor(t)]
        rec.arg_ids = frozenset(id(t) for t in tensor_args)
        orig_args = [
            (t, t._raw_data(), t.ctx, getattr(t, "_host_value", None))
            for t in tensor_args
        ]
        structs = [
            jax.ShapeDtypeStruct(d.shape, d.dtype) for _, d, _, _ in orig_args
        ]

        def discover(arg_datas):
            for t, d in zip(tensor_args, arg_datas):
                t._swap_data_raw(d)
            with _TraceScope(rec):
                self.fn(*args)
            return ()

        ok = False
        try:
            try:
                jax.eval_shape(discover, structs)
            except Exception as e:
                raise _AbstractDiscoveryError(str(e)) from e
            ok = True
        finally:
            # undo discovery: pre-existing tensors get their pre-write
            # buffers back (params/optimizer state/args)
            for tid, (d, c, hv) in rec.pre_write.items():
                t = rec.writes[tid]
                t._swap_data_raw(d)
                t._set_ctx(c)
                if hv is not None:
                    t._host_value = hv
            for t, d, c, hv in orig_args:
                t._swap_data_raw(d)
                t._set_ctx(c)
                if hv is not None:
                    t._host_value = hv
            if not ok:
                # failed mid-discovery: scrub whatever is still reachable so
                # the eager fallback does not trip over dead tracers
                rec.reads = {}
                rec.sanitize_created()

        state = self._finish_record(sig, rec, args)
        # drop the read set's strong references BEFORE sanitizing: it pins
        # every intermediate read during discovery, and only tensors still
        # referenced elsewhere (p.grad buffers, stray step state) need a
        # concrete stand-in buffer
        rec.reads = {}
        rec.sanitize_created()
        # the discovery step computed nothing -- compile now and make the
        # first call's result the compiled program's (one real step applied,
        # same as the eager contract)
        self._compile(state, args)
        return self._run(state, args)

    # -- phase 1, eager mode: real step on the host backend ------------------
    def _record_eager(self, sig, args):
        import contextlib
        import os

        # staging runs the recording step's arithmetic on the host backend
        # (fast local compiles); set LIGHTGRAD_STAGE_RECORD=0 when the first
        # step must be bit-identical to device execution
        stage = (
            jax.default_backend() != "cpu"
            and os.environ.get("LIGHTGRAD_STAGE_RECORD") != "0"
        )
        rec = _Recorder(stage_to_cpu=stage)
        dev_ctx = (
            jax.default_device(rec.cpu) if rec.cpu is not None else contextlib.nullcontext()
        )
        from .ops import runtime as _runtime

        # while staged to the host backend, keep the recording step's CPU
        # compiles OUT of the persistent cache: XLA:CPU AOT entries are
        # rejected on reload by this host class (machine-feature pseudo-flag
        # mismatch) and each rejected load emits a multi-KB warning -- the
        # stderr flood of VERDICT r2 #1.  The floor is read per cache write,
        # so raising it only for the staged window leaves tunneled TPU
        # compiles fully cached.
        cache_floor_raised = False
        fast_staging = False
        try:
            if rec.cpu is not None:
                _runtime._staging = True  # pallas can't run on the host backend
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 1e9)
                cache_floor_raised = True
                # the staged window's per-op XLA:CPU compiles are pure
                # recording overhead (their outputs only seed the tape; the
                # production program is the later device compile), and on
                # hosts whose CPU AOT cache is broken they are re-paid every
                # process -- skip the optimization pipeline for them.
                # LIGHTGRAD_STAGE_FAST=0 restores full optimization.
                if os.environ.get("LIGHTGRAD_STAGE_FAST") != "0":
                    jax.config.update("jax_disable_most_optimizations", True)
                    fast_staging = True
            with _TraceScope(rec), dev_ctx:
                out = self.fn(*args)
        finally:
            _runtime._staging = False
            if fast_staging:
                jax.config.update("jax_disable_most_optimizations", False)
            if cache_floor_raised:
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 0.0)
        # recording ran on the host backend; move results back to the device
        rec.restore_devices()
        if rec.cpu is not None:
            default = jax.devices()[0]
            for leaf in jax.tree_util.tree_leaves(out, is_leaf=_is_tensor):
                if _is_tensor(leaf):
                    d = leaf._raw_data()
                    if isinstance(d, jax.Array) and next(iter(d.devices())).platform == "cpu":
                        leaf._set_data(jax.device_put(d, default))
        self._finish_record(sig, rec, args)
        return out

    # -- phase 2: phantom traced run -> single XLA executable ---------------
    def _compile(self, state, args):
        captured, mutated = state["captured"], state["mutated"]
        # split captures: mutated ones (params, optimizer state, grads) are
        # donated so XLA updates them in place; constants are not
        mut_ids = {id(t) for t in mutated}
        cap_mut = [t for t in captured if id(t) in mut_ids]
        cap_const = [t for t in captured if id(t) not in mut_ids]
        state["cap_mut"], state["cap_const"] = cap_mut, cap_const
        tensor_args = [t for t in args if _is_tensor(t)]
        fn = self.fn

        def pure_step(arg_datas, mut_datas_in, const_datas):
            swap = (
                list(zip(tensor_args, arg_datas))
                + list(zip(cap_mut, mut_datas_in))
                + list(zip(cap_const, const_datas))
            )
            # snapshot every tensor the step touches (swapped inputs AND
            # write targets created during recording) so tracing leaves no
            # tracer behind in live tensor objects
            restore = {id(t): t for t, _ in swap}
            restore.update((id(t), t) for t in state["written"])
            old = [(t, t._raw_data(), t.ctx) for t in restore.values()]
            try:
                for t, d in swap:
                    t._set_data(d)
                out = fn(*args)
                out_leaves, out_tree = jax.tree_util.tree_flatten(
                    out, is_leaf=_is_tensor
                )
                out_datas = [t.data if _is_tensor(t) else t for t in out_leaves]
                mut_datas = [t.data for t in mutated]
                state["out_tree"] = out_tree
                state["out_is_tensor"] = [_is_tensor(t) for t in out_leaves]
                return out_datas, mut_datas
            finally:
                for t, d, c in old:
                    t._set_data(d)
                    t._set_ctx(c)

        state["compiled"] = jax.jit(pure_step, donate_argnums=(1,))

    # -- phase 3: steady-state dispatch -------------------------------------
    def _run(self, state, args):
        # value-epoch drift guard: a parameter rebind since recording means
        # the captured object set may no longer be what fn reads -- re-record
        if state["epoch"] != _capture_epoch:
            sig = self._signature(args)
            del self.cache[sig]
            return self._record(sig, args)
        arg_datas = [t.data for t in args if _is_tensor(t)]
        mut_in = [t.data for t in state["cap_mut"]]
        const_in = [t.data for t in state["cap_const"]]
        # guard against capture drift: if someone re-assigned a captured
        # tensor to a different shape/dtype since compilation, re-record
        # instead of dispatching a stale program
        if "cap_sig" not in state:
            state["cap_sig"] = [
                (d.shape, d.dtype) for d in mut_in + const_in
            ]
        elif state["cap_sig"] != [(d.shape, d.dtype) for d in mut_in + const_in]:
            sig = self._signature(args)
            del self.cache[sig]
            return self._record(sig, args)
        # a donated buffer must be unique across ALL program inputs: two
        # captured tensors can legitimately alias one jax.Array (TpuTensor
        # .copy() aliases because jax.Arrays are immutable -- e.g. EMA
        # shadows start as zero-cost copies of their params), but XLA
        # rejects double donation.  Break the alias with a real device copy
        # (first dispatch only: the program returns distinct buffers for
        # every mut slot, so aliases do not recur).
        seen = {id(d) for d in arg_datas}
        seen.update(id(d) for d in const_in)
        for i, d in enumerate(mut_in):
            if id(d) in seen:
                mut_in[i] = jax.numpy.copy(d)
            seen.add(id(mut_in[i]))
        out_datas, mut_datas = state["compiled"](arg_datas, mut_in, const_in)
        for t, d in zip(state["mutated"], mut_datas):
            t._set_data(d)
        leaves = [
            TpuTensor(d, requires_grad=False) if is_t else d
            for d, is_t in zip(out_datas, state["out_is_tensor"])
        ]
        return jax.tree_util.tree_unflatten(state["out_tree"], leaves)


def jit(fn):
    """Compile an eager-tape step function into a single XLA program."""
    return _CompiledStep(fn)
