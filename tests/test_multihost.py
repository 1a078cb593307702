"""Multi-host (2-process) regression lane over jax.distributed loopback.

ROADMAP item: ``parallel/distributed.py`` was previously tested only on the
single-process no-op path.  This lane spawns two REAL processes on this
host (CPU backend, gloo collectives over the gRPC coordinator at
127.0.0.1), each owning 2 virtual devices of a 4-device global dp mesh,
feeds per-process batch shards through ``distribute_batch``, and checks a
data-parallel gradient step agrees bit-for-bit across processes and
matches the single-process oracle.

The reference has no multi-process anything (SURVEY.md §2.3); this guards
the DCN tier of the TPU-native extension.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
port, pid = sys.argv[1], int(sys.argv[2])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from lightgrad_tpu.parallel import distributed
ok = distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                            process_id=pid)
assert ok and distributed.is_initialized()
assert distributed.process_count() == 2
assert distributed.process_index() == pid

import numpy as np, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from lightgrad_tpu.parallel import make_mesh
from lightgrad_tpu.parallel.distributed import distribute_batch

mesh = make_mesh(dp=4)          # spans both processes (4 global devices)
rng = np.random.default_rng(7)  # same params on every host
w = jnp.asarray(rng.normal(0, 0.3, (8, 4)).astype(np.float32))
full_x = rng.normal(size=(8, 8)).astype(np.float32)   # global batch
full_y = rng.normal(size=(8, 4)).astype(np.float32)
# each process feeds only ITS half of the global batch
lo, hi = pid * 4, (pid + 1) * 4
xg = distribute_batch(mesh, full_x[lo:hi], P("dp"))
yg = distribute_batch(mesh, full_y[lo:hi], P("dp"))

def loss(w, x, y):
    return jnp.mean((x @ w - y) ** 2)

g = jax.jit(jax.grad(loss),
            out_shardings=NamedSharding(mesh, P()))(w, xg, yg)
# replicated output: every process sees the full synchronized gradient
got = np.asarray(g)
want = np.asarray(jax.jit(jax.grad(loss))(w, jnp.asarray(full_x),
                                          jnp.asarray(full_y)))
np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
print(f"WORKER_OK {pid} {float(np.abs(got).sum()):.6f}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.skipif(sys.platform != "linux", reason="gloo loopback lane")
def test_two_process_dp_step(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    env["JAX_PLATFORMS"] = ""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out, out
    # both processes saw the same synchronized gradient norm
    n0 = outs[0].split("WORKER_OK 0 ")[1].split()[0]
    n1 = outs[1].split("WORKER_OK 1 ")[1].split()[0]
    assert n0 == n1, (n0, n1)
