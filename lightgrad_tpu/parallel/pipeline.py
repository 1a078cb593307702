"""Pipeline parallelism: GPipe-style microbatch schedule over a mesh axis.

Each device owns one pipeline stage's parameters (leading axis of the stacked
parameter pytree, sharded over ``pp``).  Microbatches enter at stage 0 and
activations hop stage-to-stage with ``lax.ppermute`` over the ICI ring; the
last stage's outputs are psum-broadcast back.  The schedule runs
``n_micro + P - 1`` ticks (the classic bubble).  Because the whole thing is a
pure jax program, ``jax.grad`` differentiates straight through the collective
permutes (their transpose is the reverse permute), giving pipeline-parallel
*training* for free.

Constraints (GPipe classic): every stage maps activations of one shape to the
same shape -- exactly the transformer-block case.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

__all__ = ["pipeline_apply", "pipeline_apply_interleaved", "interleaved_ticks",
           "gpipe_ticks"]


def pipeline_apply(stage_fn, stacked_params, x_micro, mesh, axis: str = "pp"):
    """Run microbatches through a P-stage pipeline.

    stage_fn        -- ``(params, x) -> y`` with ``y.shape == x.shape``
    stacked_params  -- pytree whose leaves have a leading axis of size P
                       (stage dimension), sharded ``P(axis)`` over the mesh
    x_micro         -- ``(n_micro, mb, ...)`` microbatched input (replicated)
    returns         -- ``(n_micro, mb, ...)`` outputs (replicated)
    """
    n_stages = mesh.shape[axis]
    n_micro = x_micro.shape[0]
    ticks = n_micro + n_stages - 1

    def per_device(params, xs):
        # params: this device's stage slice, leading axis 1 -- drop it
        params = jax.tree_util.tree_map(lambda a: a[0], params)
        idx = jax.lax.axis_index(axis)
        fwd_perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        mb_shape = xs.shape[1:]
        recv = jnp.zeros(mb_shape, xs.dtype)
        outs = jnp.zeros((n_micro,) + mb_shape, xs.dtype)
        for t in range(ticks):  # static unroll: schedule is compile-time
            inject = xs[min(t, n_micro - 1)]
            cur = jnp.where(idx == 0, inject, recv)
            y = stage_fn(params, cur)
            # microbatch m leaves the last stage at tick m + P - 1
            m = t - (n_stages - 1)
            if m >= 0:
                contrib = jnp.where(idx == n_stages - 1, y, jnp.zeros_like(y))
                outs = outs.at[m].set(contrib)
            recv = jax.lax.ppermute(y, axis, fwd_perm)
        # broadcast the last stage's collected outputs to every device
        return jax.lax.psum(outs, axis)

    pspec = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)
    return shard_map(
        per_device,
        mesh=mesh,
        in_specs=(pspec, P()),
        out_specs=P(),
        check_vma=False,
    )(stacked_params, x_micro)


# ---------------------------------------------------------------------------
# interleaved (virtual-stage) schedule -- the Megatron-LM bubble shrink
# ---------------------------------------------------------------------------
def gpipe_ticks(n_micro: int, n_stages: int, n_virtual: int = 1) -> int:
    """GPipe drain latency in block-units for a model of n_stages*n_virtual
    blocks run as n_stages one-per-device stages of depth n_virtual."""
    return n_virtual * (n_micro + n_stages - 1)


def interleaved_ticks(n_micro: int, n_stages: int, n_virtual: int) -> int:
    """Interleaved drain latency in block-units, waves packed back-to-back.

    A full wave of P microbatches keeps every device busy for exactly
    ``P*V`` consecutive ticks (V chunk-visits per microbatch, no idle gap in
    steady state), so wave ``w`` starts at tick ``w*P*V`` and only the last
    (possibly partial) wave pays the ``P*V - 1`` drain."""
    n_waves = -(-n_micro // n_stages)
    last = n_micro - (n_waves - 1) * n_stages
    return (n_waves - 1) * n_stages * n_virtual + last + n_stages * n_virtual - 1


def pipeline_apply_interleaved(stage_fn, stacked_params, x_micro, mesh,
                               axis: str = "pp", n_virtual: int = 2):
    """Interleaved virtual-stage pipeline (Megatron-LM style model chunking).

    The model's ``P * V`` blocks are dealt round-robin: device ``d`` owns
    chunks ``{c*P + d : c < V}``, so a microbatch hops the ring V times.  The
    drain latency falls from GPipe's ``V*(n_micro + P - 1)`` block-units to
    ``n_micro + P*V - 1`` for one wave -- the bubble shrinks by ~1/V (e.g. 11
    vs 14 ticks at n_micro=4, P=4, V=2).  For ``n_micro > P`` the schedule
    packs waves of P microbatches back-to-back: a full wave keeps every
    device busy P*V consecutive ticks, so waves chain with NO inter-wave
    bubble (``interleaved_ticks``).  Like :func:`pipeline_apply`, the whole
    schedule is one pure jax program: ``jax.grad`` differentiates through
    the ppermutes, so training works.

    stage_fn        -- ``(params, x) -> y`` with ``y.shape == x.shape``
    stacked_params  -- pytree, leaves ``(P*V, ...)``: block ``s = c*P + d``
                       lives at leaf index ``s`` (sharded P(axis) after the
                       (V, P) regroup below)
    x_micro         -- ``(n_micro, mb, ...)``, replicated
    """
    n_stages = mesh.shape[axis]
    n_micro = x_micro.shape[0]
    V = n_virtual
    n_waves = -(-n_micro // n_stages)
    ticks = interleaved_ticks(n_micro, n_stages, V)

    # regroup (P*V, ...) -> (V, P, ...) so the device axis shards cleanly:
    # chunk c of device d is stacked[c*P + d] == grouped[c, d]
    grouped = jax.tree_util.tree_map(
        lambda a: a.reshape((V, n_stages) + a.shape[1:]), stacked_params)

    def per_device(params, xs):
        # params leaves: (V, 1, ...) -- this device's V chunks
        params = jax.tree_util.tree_map(lambda a: a[:, 0], params)
        d = jax.lax.axis_index(axis)
        fwd_perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        mb_shape = xs.shape[1:]
        recv = jnp.zeros(mb_shape, xs.dtype)
        outs = jnp.zeros((n_micro,) + mb_shape, xs.dtype)
        for t in range(ticks):  # static unroll
            # wave w's block (m, c) runs on device d at tick
            # t = w*P*V + (m % P) + c*P + d
            rel = t - d                       # traced (d is the axis index)
            w = rel // (n_stages * V)
            within = rel % (n_stages * V)
            c = within // n_stages            # in [0, V) by construction
            m = jnp.clip(w * n_stages + within % n_stages, 0, n_micro - 1)
            active = (rel >= 0) & (w < n_waves) \
                & (w * n_stages + within % n_stages < n_micro)
            chunk = jax.tree_util.tree_map(lambda a: a[c], params)
            inject = xs[m]
            # only the model's FIRST block (chunk 0 on device 0) takes fresh
            # microbatches; every other block consumes the ring activation
            x_in = jnp.where((c == 0) & (d == 0) & active, inject, recv)
            y = stage_fn(chunk, x_in)
            y = jnp.where(active, y, recv)    # idle devices forward as-is
            done = active & (c == V - 1) & (d == n_stages - 1)
            outs = outs.at[m].set(jnp.where(done, y, outs[m]))
            if t + 1 < ticks:
                recv = jax.lax.ppermute(y, axis, fwd_perm)
        return jax.lax.psum(outs, axis)

    pspec = jax.tree_util.tree_map(lambda _: P(None, axis), grouped)
    return shard_map(
        per_device,
        mesh=mesh,
        in_specs=(pspec, P()),
        out_specs=P(),
        check_vma=False,
    )(grouped, x_micro)
