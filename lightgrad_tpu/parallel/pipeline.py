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

__all__ = ["pipeline_apply"]


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
