"""1F1B pipeline-parallel training step (memory-bounded schedule).

``pipeline_apply`` + ``jax.grad`` gives pipeline *training*, but jax autodiff
runs all forwards before any backward, so every device stores activations for
all ``n_micro`` microbatches.  The classic 1F1B schedule (PipeDream-flush /
Megatron-LM) interleaves each microbatch's backward as early as its forward
chain allows, bounding in-flight activations per device to at most ``P``
(pipeline depth) regardless of ``n_micro`` -- the difference between "memory
grows with gradient-accumulation length" and "memory is constant".

jax gives no schedule control inside ``grad``, so this module orchestrates
the VJPs manually:

* The schedule itself is simulated **host-side** (`_schedule`): a static
  (ticks, P) table of per-device actions {idle, fwd, bwd} + microbatch ids,
  honoring transfer latency (an activation sent at tick t is usable at t+1)
  and the 1F1B policy (``min(P-d, M)`` warmup forwards, then prefer
  backward).  The table is baked into the compiled program as constants.
* Each tick, every device selects its block with ``lax.switch`` on its
  (runtime) mesh index -- real control flow, so an idle/bwd device does NOT
  pay the forward's FLOPs -- then unconditionally runs the two ring
  ``ppermute``s (activations rightward, cotangents leftward), keeping the
  program SPMD.
* The backward block **rematerializes** the stage forward from the stashed
  stage *input* via ``jax.vjp`` (stage-granularity activation checkpointing:
  the stash holds one activation-shaped buffer per in-flight microbatch, not
  the stage's internal residuals, so its shape is static and uniform).  The
  stash has ``min(P, M)`` slots addressed by ``m % P``; 1F1B's in-flight
  window <= P makes slot reuse collision-free.

The reference has no pipeline (or any) parallelism -- its closest analogue
is the sequential layer loop (``/root/reference/examples/bert.py:165-166``);
this is the TPU-native extension axis: ICI-ring scheduling of the same
blocks.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map

__all__ = ["pipeline_train_1f1b", "onef_oneb_ticks", "peak_in_flight"]

_IDLE, _FWD, _BWD = 0, 1, 2


@functools.lru_cache(maxsize=None)
def _schedule(n_micro: int, n_stages: int):
    """Static 1F1B schedule -> (action, mb) int arrays of shape (ticks, P).

    Greedy simulation under the 1F1B policy: device d runs ``min(P-d, M)``
    warmup forwards, then takes a backward whenever one is ready, else a
    forward (capped at P in flight).  Dependencies model the ring latency:
    a block's upstream product must exist at a strictly earlier tick."""
    M, Pn = n_micro, n_stages
    next_f, next_b = [0] * Pn, [0] * Pn
    f_done = [[-1] * M for _ in range(Pn)]   # tick fwd(d, m) ran
    b_done = [[-1] * M for _ in range(Pn)]   # tick bwd(d, m) ran
    actions, mbs = [], []
    t = 0
    while any(b < M for b in next_b):
        assert t <= 4 * (M + Pn), "1F1B schedule failed to converge"
        row_a, row_m = [], []
        for d in range(Pn):
            mf, mb = next_f[d], next_b[d]
            can_f = mf < M and (d == 0 or 0 <= f_done[d - 1][mf] < t)
            can_b = mb < M and (
                (d == Pn - 1 and 0 <= f_done[d][mb] < t)
                or (d < Pn - 1 and 0 <= b_done[d + 1][mb] < t)
            )
            in_flight = mf - mb
            warmup = min(Pn - d, M)
            if mf < warmup and can_f:
                a, m = _FWD, mf
            elif can_b:
                a, m = _BWD, mb
            elif can_f and in_flight < Pn:
                a, m = _FWD, mf
            else:
                a, m = _IDLE, 0
            row_a.append(a)
            row_m.append(m)
        # commit the whole tick at once (same-tick products are not visible)
        for d, (a, m) in enumerate(zip(row_a, row_m)):
            if a == _FWD:
                f_done[d][m] = t
                next_f[d] += 1
            elif a == _BWD:
                b_done[d][m] = t
                next_b[d] += 1
        actions.append(row_a)
        mbs.append(row_m)
        t += 1
    return np.asarray(actions, np.int32), np.asarray(mbs, np.int32)


@functools.lru_cache(maxsize=None)
def _arrival_tables(n_micro: int, n_stages: int):
    """Per-tick ring arrivals -> (f_arr, b_arr), shape (ticks, P), entry m
    if an activation (resp. cotangent) for microbatch m lands on device d at
    tick t (sent by the neighbor at t-1), else -1.

    A device may consume an arrival ticks later (1F1B delays forwards past
    backwards), and the ring register is overwritten every tick -- so the
    runtime loop banks arrivals into the stash the tick they land, keyed by
    these tables."""
    action, mb = _schedule(n_micro, n_stages)
    ticks = action.shape[0]
    f_arr = -np.ones((ticks, n_stages), np.int32)
    b_arr = -np.ones((ticks, n_stages), np.int32)
    for t in range(1, ticks):
        for d in range(n_stages):
            if d > 0 and action[t - 1, d - 1] == _FWD:
                f_arr[t, d] = mb[t - 1, d - 1]
            if d < n_stages - 1 and action[t - 1, d + 1] == _BWD:
                b_arr[t, d] = mb[t - 1, d + 1]
    # slot-reuse safety: between an arrival and its consuming block, no other
    # microbatch may map to the same (stash, slot)
    n_slots = min(n_stages, n_micro)
    for arr, consume_act in ((f_arr, _FWD), (b_arr, _BWD)):
        for d in range(n_stages):
            live = {}  # slot -> m
            for t in range(ticks):
                m = arr[t, d]
                if m >= 0:
                    s = m % n_slots
                    assert live.get(s, m) == m, (
                        f"stash slot collision d={d} t={t}")
                    live[s] = m
                if action[t, d] == consume_act:
                    live.pop(mb[t, d] % n_slots, None)
    return f_arr, b_arr


def onef_oneb_ticks(n_micro: int, n_stages: int) -> int:
    """Schedule length in block-ticks (~ 2*(M + P - 1) + interleave slack)."""
    return _schedule(n_micro, n_stages)[0].shape[0]


def peak_in_flight(n_micro: int, n_stages: int) -> int:
    """Max simultaneously-stashed activations on any device (<= P)."""
    action, mb = _schedule(n_micro, n_stages)
    peak, cur = 0, [0] * n_stages
    for t in range(action.shape[0]):
        for d in range(n_stages):
            if action[t, d] == _FWD:
                cur[d] += 1
            elif action[t, d] == _BWD:
                cur[d] -= 1
        peak = max(peak, max(cur))
    return peak


def pipeline_train_1f1b(stage_fn, loss_fn, stacked_params, x_micro, y_micro,
                        mesh, axis: str = "pp"):
    """One pipeline-parallel training step under the 1F1B schedule.

    stage_fn        -- ``(params, x) -> y``, ``y.shape == x.shape``
    loss_fn         -- ``(y_last, target) -> scalar`` (per-microbatch)
    stacked_params  -- pytree, leaves ``(P, ...)`` sharded ``P(axis)``
    x_micro         -- ``(n_micro, mb, ...)`` inputs (replicated)
    y_micro         -- ``(n_micro, ...)`` per-microbatch targets (replicated)
    returns         -- ``(loss, grads)``: mean microbatch loss (replicated
                       scalar) and d(loss)/d(stacked_params) with the same
                       ``(P, ...)`` stacked/sharded layout.
    """
    n_stages = mesh.shape[axis]
    n_micro = x_micro.shape[0]
    action_tab, mb_tab = _schedule(n_micro, n_stages)
    f_arr_tab, b_arr_tab = _arrival_tables(n_micro, n_stages)
    ticks = action_tab.shape[0]
    n_slots = min(n_stages, n_micro)
    inv_m = 1.0 / n_micro

    def per_device(params, xs, ys):
        params = jax.tree_util.tree_map(lambda a: a[0], params)
        d = jax.lax.axis_index(axis)
        last = n_stages - 1
        fwd_perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        bwd_perm = [(i, (i - 1) % n_stages) for i in range(n_stages)]
        mb_shape = xs.shape[1:]
        zero_mb = jnp.zeros(mb_shape, xs.dtype)

        # activation stash (stage inputs awaiting fwd, then awaiting bwd
        # remat) and cotangent stash (arrived dy awaiting the bwd block) --
        # both hold <= min(P, M) microbatches by 1F1B's in-flight bound
        stash = jnp.zeros((n_slots,) + mb_shape, xs.dtype)
        cots = jnp.zeros((n_slots,) + mb_shape, xs.dtype)
        gacc = jax.tree_util.tree_map(
            lambda a: jnp.zeros_like(a), params)
        lacc = jnp.zeros((), jnp.float32)
        f_recv = b_recv = zero_mb

        acts = jnp.asarray(action_tab)   # (ticks, P) baked constants
        mbs = jnp.asarray(mb_tab)
        f_arrs = jnp.asarray(f_arr_tab)
        b_arrs = jnp.asarray(b_arr_tab)

        def bank(buf, m_arr, val):
            """Write val into buf[m_arr % slots] when m_arr >= 0."""
            slot = jnp.maximum(m_arr, 0) % n_slots
            cur = jax.lax.dynamic_index_in_dim(buf, slot, 0, keepdims=False)
            return jax.lax.dynamic_update_index_in_dim(
                buf, jnp.where(m_arr >= 0, val, cur), slot, axis=0)

        def fwd_block(m, stash, cots, gacc, lacc):
            x_in = jnp.where(
                d == 0, xs[m],
                jax.lax.dynamic_index_in_dim(
                    stash, m % n_slots, axis=0, keepdims=False))
            y = stage_fn(params, x_in)
            # re-bank x_in so device 0 (whose input never rode the ring)
            # also has it for the backward remat
            stash = jax.lax.dynamic_update_index_in_dim(
                stash, x_in, m % n_slots, axis=0)
            return stash, cots, gacc, lacc, y, zero_mb

        def bwd_block(m, stash, cots, gacc, lacc):
            x_in = jax.lax.dynamic_index_in_dim(
                stash, m % n_slots, axis=0, keepdims=False)
            y, vjp = jax.vjp(stage_fn, params, x_in)
            # cotangent: banked ring arrival for interior stages; local loss
            # VJP at the last stage (both are computed, the select is
            # branch-free -- the loss grad is elementwise-cheap next to the
            # stage VJP)
            loss_m, loss_vjp = jax.vjp(lambda yy: loss_fn(yy, ys[m]), y)
            (dy_loss,) = loss_vjp(jnp.ones((), loss_m.dtype) * inv_m)
            dy_ring = jax.lax.dynamic_index_in_dim(
                cots, m % n_slots, axis=0, keepdims=False)
            dy = jnp.where(d == last, dy_loss.astype(y.dtype), dy_ring)
            dparams, dx = vjp(dy)
            gacc = jax.tree_util.tree_map(jnp.add, gacc, dparams)
            lacc = lacc + jnp.where(
                d == last, loss_m.astype(jnp.float32) * inv_m, 0.0)
            return stash, cots, gacc, lacc, zero_mb, dx

        def idle_block(m, stash, cots, gacc, lacc):
            return stash, cots, gacc, lacc, zero_mb, zero_mb

        for t in range(ticks):  # static unroll; per-tick branch is runtime
            # bank last tick's ring arrivals before running this tick's block
            stash = bank(stash, f_arrs[t, d], f_recv)
            cots = bank(cots, b_arrs[t, d], b_recv)
            act = acts[t, d]
            m = mbs[t, d]
            stash, cots, gacc, lacc, f_send, b_send = jax.lax.switch(
                act, (idle_block, fwd_block, bwd_block),
                m, stash, cots, gacc, lacc)
            f_recv = jax.lax.ppermute(f_send, axis, fwd_perm)
            b_recv = jax.lax.ppermute(b_send, axis, bwd_perm)

        loss = jax.lax.psum(lacc, axis)
        gacc = jax.tree_util.tree_map(lambda a: a[None], gacc)
        return loss, gacc

    pspec = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)
    return shard_map(
        per_device,
        mesh=mesh,
        in_specs=(pspec, P(), P()),
        out_specs=(P(), pspec),
        check_vma=False,
    )(stacked_params, x_micro, y_micro)


def module_stages(blocks):
    """Bridge a list of P structurally-identical ``nn.Module`` blocks to the
    ``(stage_fn, stacked_params)`` contract of :func:`pipeline_train_1f1b`.

    The stage function runs the block's tape ops with its parameters' data
    swapped for the traced stage arrays (the same re-trace trick as the step
    compiler, jit.py), so a transformer block written against the eager
    tensor API trains pipeline-parallel without a jax rewrite.  Gradients
    come back as the same stacked {name: (P, ...)} dict.

    Blocks run in inference-mode graph structure (ctx-free under no_grad --
    jax.vjp supplies the differentiation), so python-level randomness like
    Dropout must be disabled (``block.eval()``).
    """
    from ..autograd import Gradients
    from ..autograd.tpu.tensor import TpuTensor

    names = [n for n, _ in blocks[0].named_parameters()]
    per_block = []
    for b in blocks:
        d = dict(b.named_parameters())
        assert [n for n, _ in b.named_parameters()] == names, \
            "pipeline blocks must be structurally identical"
        per_block.append(d)
    stacked = {
        n: jnp.stack([pb[n].data for pb in per_block])
        for n in names
    }
    proto = blocks[0]
    proto_params = dict(proto.named_parameters())

    def stage_fn(params, x):
        old = [(p, p._raw_data()) for p in proto_params.values()]
        try:
            for n, p in proto_params.items():
                p._set_data(params[n])
            with Gradients.no_grad():
                out = proto(TpuTensor(x, requires_grad=False))
            return out.data
        finally:
            for p, d in old:
                p._set_data(d)

    return stage_fn, stacked


def load_module_grads(blocks, grads):
    """Write stacked 1F1B grads {name: (P, ...)} back onto each block's
    parameter ``.grad`` slots (so existing optimizers drive the update)."""
    from ..autograd.tpu.tensor import TpuTensor

    for i, b in enumerate(blocks):
        for n, p in b.named_parameters():
            p.zero_grad()
            p.add_grad(TpuTensor(grads[n][i], requires_grad=False))
