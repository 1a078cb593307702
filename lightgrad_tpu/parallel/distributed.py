"""Multi-host (DCN) process groups via ``jax.distributed``.

Single-host multi-chip scaling rides ICI through ``make_mesh`` + GSPMD; this
module adds the pod/multi-host tier: one jax process per host, the
coordinator-based runtime handshake, and per-host batch feeding.  On Cloud
TPU pods ``jax.distributed.initialize()`` auto-detects everything from the
metadata server; elsewhere pass coordinator/process explicitly or set the
standard env vars (``COORDINATOR_ADDRESS``, ``NUM_PROCESSES``,
``PROCESS_ID``).

After :func:`initialize`, ``jax.devices()`` spans every host, so
``make_mesh(dp=..., tp=...)`` transparently builds a global mesh -- lay the
fast axes (tp/sp) inside a host (ICI) and the dp axis across hosts (DCN).
``distribute_batch`` turns each host's local shard of a batch into one
global sharded array (the multi-host input-feeding pattern); it degrades to
a plain ``device_put`` on a single process, so data pipelines are written
once and run anywhere.
"""

import os

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["initialize", "is_initialized", "process_count", "process_index",
           "distribute_batch"]

_initialized = False


def initialize(coordinator_address: str = None, num_processes: int = None,
               process_id: int = None, local_device_ids=None) -> bool:
    """Bring up the multi-host runtime.  Returns True when a multi-process
    group was joined, False for the single-process no-op path."""
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("NUM_PROCESSES"):
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and os.environ.get("PROCESS_ID"):
        process_id = int(os.environ["PROCESS_ID"])
    # pod auto-detect: >1 worker hostname (a single entry is just this host
    # -- some PJRT plugins, e.g. axon, set TPU_WORKER_HOSTNAMES=localhost)
    hosts = [h for h in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h]
    on_pod = len(hosts) > 1 or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    if coordinator_address is None and not on_pod:
        return False  # single host: nothing to join
    from jax._src import xla_bridge

    if xla_bridge.backends_are_initialized() and coordinator_address is None:
        # too late to join a group in this process; stay single-host rather
        # than crash (explicit coordinator still raises loudly below)
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    return True


def is_initialized() -> bool:
    return _initialized


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def distribute_batch(mesh, local_batch, spec: P):
    """One global sharded array from each process's LOCAL batch shard.

    Multi-host jax cannot ``device_put`` a host-local numpy array onto a
    global mesh directly; ``make_array_from_process_local_data`` assembles
    the global view from per-host pieces.  Single-process, this is exactly
    ``device_put`` with the same sharding -- so data code is portable.
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, local_batch)
