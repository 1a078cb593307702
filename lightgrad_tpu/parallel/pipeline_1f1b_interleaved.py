"""Interleaved-1F1B: virtual-stage chunking under the 1F1B memory schedule.

Combines the two pipeline refinements that exist separately in this package
(VERDICT r2 #10): ``parallel/pipeline.py``'s interleaved virtual stages
(each device holds V model chunks, shrinking the warmup bubble ~V-fold) and
``parallel/pipeline_1f1b.py``'s one-forward-one-backward schedule (in-flight
activations bounded regardless of gradient-accumulation length).

Layout: virtual stage ``s = c*P + d`` lives on device ``d = s % P`` as chunk
``c = s // P`` (Megatron round-robin), so every s -> s+1 activation hop and
s -> s-1 cotangent hop is one ring ``ppermute`` to the physical neighbor --
the same SPMD ring as the flat schedule, just with (chunk, microbatch)-keyed
blocks and per-chunk stashes.

The schedule is simulated host-side like the flat one: greedy, prefer a
ready backward (drain deepest virtual stage first), else the lowest-pending
ready forward, with per-virtual-stage in-flight capped at the stash depth.
A slot-collision assert at table-build time proves the stash addressing
(``m % n_slots`` per chunk) is collision-free for the produced schedule.

The reference has no pipeline (or any) parallelism (SURVEY.md §2.3); this
is TPU-native extension infrastructure.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map

__all__ = ["pipeline_train_1f1b_interleaved", "interleaved_ticks",
           "interleaved_peak_in_flight"]

_IDLE, _FWD, _BWD = 0, 1, 2


@functools.lru_cache(maxsize=None)
def _schedule_v(n_micro: int, n_stages: int, n_chunks: int):
    """Static interleaved-1F1B tables, each (ticks, P): action, microbatch,
    chunk.  One block per device per tick; dependencies honor the ring
    latency (a product sent at t is usable at t+1, i.e. strictly-earlier
    completion)."""
    M, Pn, V = n_micro, n_stages, n_chunks
    S = Pn * V
    n_slots = min(Pn, M)
    next_f, next_b = [0] * S, [0] * S
    f_done = [[-1] * M for _ in range(S)]
    b_done = [[-1] * M for _ in range(S)]
    actions, mbs, chunks = [], [], []
    t = 0
    while any(b < M for b in next_b):
        assert t <= 6 * (M * V + S) + 16, "interleaved-1F1B failed to converge"
        row_a, row_m, row_c = [], [], []
        for d in range(Pn):
            stages = list(range(d, S, Pn))  # this device's virtual stages
            pick = (_IDLE, 0, 0)
            # ready backward, deepest virtual stage first (drains memory)
            for s in sorted(stages, reverse=True):
                mb = next_b[s]
                if mb >= M:
                    continue
                ready = (
                    (s == S - 1 and 0 <= f_done[s][mb] < t)
                    or (s < S - 1 and 0 <= b_done[s + 1][mb] < t)
                )
                if ready:
                    pick = (_BWD, mb, s // Pn)
                    break
            if pick[0] == _IDLE:
                # ready forward: smallest pending microbatch, then shallowest
                # stage (keeps chunk-0 streaming while later chunks fill)
                best = None
                for s in stages:
                    mf = next_f[s]
                    if mf >= M or next_f[s] - next_b[s] >= n_slots:
                        continue
                    if s > 0 and not (0 <= f_done[s - 1][mf] < t):
                        continue
                    key = (mf, s)
                    if best is None or key < best[0]:
                        best = (key, s, mf)
                if best is not None:
                    _, s, mf = best
                    pick = (_FWD, mf, s // Pn)
            row_a.append(pick[0])
            row_m.append(pick[1])
            row_c.append(pick[2])
        for d, (a, m, c) in enumerate(zip(row_a, row_m, row_c)):
            s = c * Pn + d
            if a == _FWD:
                f_done[s][m] = t
                next_f[s] += 1
            elif a == _BWD:
                b_done[s][m] = t
                next_b[s] += 1
        actions.append(row_a)
        mbs.append(row_m)
        chunks.append(row_c)
        t += 1
    return (np.asarray(actions, np.int32), np.asarray(mbs, np.int32),
            np.asarray(chunks, np.int32))


@functools.lru_cache(maxsize=None)
def _arrival_tables_v(n_micro: int, n_stages: int, n_chunks: int):
    """Ring arrivals -> (f_m, f_c, b_m, b_c), each (ticks, P): microbatch and
    chunk landing on device d at tick t (-1 = nothing).  Asserts stash-slot
    safety per (device, chunk)."""
    action, mb, ch = _schedule_v(n_micro, n_stages, n_chunks)
    Pn, V = n_stages, n_chunks
    ticks = action.shape[0]
    f_m = -np.ones((ticks, Pn), np.int32)
    f_c = np.zeros((ticks, Pn), np.int32)
    b_m = -np.ones((ticks, Pn), np.int32)
    b_c = np.zeros((ticks, Pn), np.int32)
    for t in range(1, ticks):
        for d in range(Pn):
            src = (d - 1) % Pn
            if action[t - 1, src] == _FWD:
                c = ch[t - 1, src]
                # (c, P-1) -> (c+1, 0); the last virtual stage's output is
                # not consumed by anyone
                cc = c + 1 if src == Pn - 1 else c
                if d != 0 or src == Pn - 1:
                    if not (src == Pn - 1 and c == V - 1):
                        f_m[t, d] = mb[t - 1, src]
                        f_c[t, d] = cc
            srcb = (d + 1) % Pn
            if action[t - 1, srcb] == _BWD:
                c = ch[t - 1, srcb]
                cc = c - 1 if srcb == 0 else c
                if not (srcb == 0 and c == 0):  # stage 0's dx is discarded
                    b_m[t, d] = mb[t - 1, srcb]
                    b_c[t, d] = cc
    # slot-reuse safety per (device, chunk)
    n_slots = min(Pn, n_micro)
    for (arr_m, arr_c), consume in (((f_m, f_c), _FWD), ((b_m, b_c), _BWD)):
        for d in range(Pn):
            live = {}  # (chunk, slot) -> m
            for t in range(ticks):
                m = arr_m[t, d]
                if m >= 0:
                    key = (arr_c[t, d], m % n_slots)
                    assert live.get(key, m) == m, (
                        f"stash collision d={d} t={t} {key}")
                    live[key] = m
                if action[t, d] == consume:
                    live.pop((ch[t, d], mb[t, d] % n_slots), None)
    return f_m, f_c, b_m, b_c


def interleaved_ticks(n_micro: int, n_stages: int, n_chunks: int) -> int:
    return _schedule_v(n_micro, n_stages, n_chunks)[0].shape[0]


def interleaved_peak_in_flight(n_micro: int, n_stages: int, n_chunks: int) -> int:
    """Max simultaneously-stashed activations on any device (all chunks)."""
    action, mb, ch = _schedule_v(n_micro, n_stages, n_chunks)
    peak, cur = 0, [0] * n_stages
    for t in range(action.shape[0]):
        for d in range(n_stages):
            if action[t, d] == _FWD:
                cur[d] += 1
            elif action[t, d] == _BWD:
                cur[d] -= 1
        peak = max(peak, max(cur))
    return peak


def pipeline_train_1f1b_interleaved(stage_fn, loss_fn, stacked_params,
                                    x_micro, y_micro, mesh, axis: str = "pp",
                                    n_chunks: int = 2):
    """One interleaved-1F1B pipeline training step.

    stage_fn        -- ``(params, x) -> y``, ``y.shape == x.shape``
    loss_fn         -- ``(y_last, target) -> scalar`` (per-microbatch)
    stacked_params  -- pytree, leaves ``(P, V, ...)`` sharded ``P(axis)`` on
                       dim 0; virtual stage ``c*P + d`` uses ``leaf[d, c]``
    x_micro         -- ``(n_micro, mb, ...)`` microbatch inputs (replicated)
    y_micro         -- ``(n_micro, ...)`` per-microbatch targets (replicated)
    returns         -- ``(loss, grads)`` with grads in the same (P, V, ...)
                       layout.
    """
    Pn = mesh.shape[axis]
    V = n_chunks
    M = x_micro.shape[0]
    action_tab, mb_tab, ch_tab = _schedule_v(M, Pn, V)
    f_m_tab, f_c_tab, b_m_tab, b_c_tab = _arrival_tables_v(M, Pn, V)
    ticks = action_tab.shape[0]
    n_slots = min(Pn, M)
    inv_m = 1.0 / M

    def per_device(params, xs, ys):
        params = jax.tree_util.tree_map(lambda a: a[0], params)  # (V, ...)
        d = jax.lax.axis_index(axis)
        last = Pn - 1
        fwd_perm = [(i, (i + 1) % Pn) for i in range(Pn)]
        bwd_perm = [(i, (i - 1) % Pn) for i in range(Pn)]
        mb_shape = xs.shape[1:]
        zero_mb = jnp.zeros(mb_shape, xs.dtype)

        stash = jnp.zeros((V, n_slots) + mb_shape, xs.dtype)
        cots = jnp.zeros((V, n_slots) + mb_shape, xs.dtype)
        gacc = jax.tree_util.tree_map(lambda a: jnp.zeros_like(a), params)
        lacc = jnp.zeros((), jnp.float32)
        f_recv = b_recv = zero_mb

        def read2(buf, c, slot):
            row = jax.lax.dynamic_index_in_dim(buf, c, 0, keepdims=False)
            return jax.lax.dynamic_index_in_dim(row, slot, 0, keepdims=False)

        def write2(buf, c, slot, val):
            row = jax.lax.dynamic_index_in_dim(buf, c, 0, keepdims=False)
            row = jax.lax.dynamic_update_index_in_dim(row, val, slot, axis=0)
            return jax.lax.dynamic_update_index_in_dim(buf, row, c, axis=0)

        def bank(buf, m_arr, c_arr, val):
            slot = jnp.maximum(m_arr, 0) % n_slots
            cur = read2(buf, c_arr, slot)
            return write2(buf, c_arr, slot,
                          jnp.where(m_arr >= 0, val, cur))

        def params_at(c):
            return jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(a, c, 0, keepdims=False),
                params)

        def fwd_block(c, m, stash, cots, gacc, lacc):
            first = jnp.logical_and(d == 0, c == 0)
            x_in = jnp.where(first, xs[m], read2(stash, c, m % n_slots))
            y = stage_fn(params_at(c), x_in)
            stash = write2(stash, c, m % n_slots, x_in)
            return stash, cots, gacc, lacc, y, zero_mb

        def bwd_block(c, m, stash, cots, gacc, lacc):
            x_in = read2(stash, c, m % n_slots)
            pc = params_at(c)
            y, vjp = jax.vjp(stage_fn, pc, x_in)
            loss_m, loss_vjp = jax.vjp(lambda yy: loss_fn(yy, ys[m]), y)
            (dy_loss,) = loss_vjp(jnp.ones((), loss_m.dtype) * inv_m)
            is_last = jnp.logical_and(d == last, c == V - 1)
            dy = jnp.where(is_last, dy_loss.astype(y.dtype),
                           read2(cots, c, m % n_slots))
            dparams, dx = vjp(dy)
            gacc = jax.tree_util.tree_map(
                lambda g, dg: jax.lax.dynamic_update_index_in_dim(
                    g,
                    jax.lax.dynamic_index_in_dim(g, c, 0, keepdims=False) + dg,
                    c, axis=0),
                gacc, dparams)
            lacc = lacc + jnp.where(
                is_last, loss_m.astype(jnp.float32) * inv_m, 0.0)
            return stash, cots, gacc, lacc, zero_mb, dx

        def idle_block(c, m, stash, cots, gacc, lacc):
            return stash, cots, gacc, lacc, zero_mb, zero_mb

        acts = jnp.asarray(action_tab)
        mbs_ = jnp.asarray(mb_tab)
        chs = jnp.asarray(ch_tab)
        f_ms, f_cs = jnp.asarray(f_m_tab), jnp.asarray(f_c_tab)
        b_ms, b_cs = jnp.asarray(b_m_tab), jnp.asarray(b_c_tab)

        for t in range(ticks):  # static unroll; per-tick branch is runtime
            stash = bank(stash, f_ms[t, d], f_cs[t, d], f_recv)
            cots = bank(cots, b_ms[t, d], b_cs[t, d], b_recv)
            stash, cots, gacc, lacc, f_send, b_send = jax.lax.switch(
                acts[t, d], (idle_block, fwd_block, bwd_block),
                chs[t, d], mbs_[t, d], stash, cots, gacc, lacc)
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


def module_stages_interleaved(blocks, n_stages: int, n_chunks: int):
    """Bridge P*V structurally identical ``nn.Module`` blocks to the
    ``(stage_fn, stacked_params)`` contract of
    :func:`pipeline_train_1f1b_interleaved`.

    ``blocks[s]`` is virtual stage s (model order); it lands on device
    ``s % P`` as chunk ``s // P``, so the stacked leaves are (P, V, ...)
    with ``leaf[d, c] = blocks[c*P + d]``.  Same tape-data-swap trick as
    ``pipeline_1f1b.module_stages`` (blocks must be eval-mode /
    dropout-free: jax.vjp supplies differentiation)."""
    from ..autograd import Gradients
    from ..autograd.tpu.tensor import TpuTensor

    Pn, V = n_stages, n_chunks
    assert len(blocks) == Pn * V, (len(blocks), Pn, V)
    names = [n for n, _ in blocks[0].named_parameters()]
    per_block = []
    for b in blocks:
        d = dict(b.named_parameters())
        assert [n for n, _ in b.named_parameters()] == names, \
            "pipeline blocks must be structurally identical"
        per_block.append(d)
    stacked = {
        n: jnp.stack([
            jnp.stack([per_block[c * Pn + d][n].data for c in range(V)])
            for d in range(Pn)
        ])
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


def load_module_grads_interleaved(blocks, grads, n_stages: int, n_chunks: int):
    """Write stacked (P, V, ...) grads back onto each block's ``.grad``."""
    from ..autograd.tpu.tensor import TpuTensor

    for s, b in enumerate(blocks):
        d, c = s % n_stages, s // n_stages
        for n, p in b.named_parameters():
            p.zero_grad()
            p.add_grad(TpuTensor(grads[n][d, c], requires_grad=False))
