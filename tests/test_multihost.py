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


_TRAIN_WORKER = r"""
import os, sys
port, pid = sys.argv[1], int(sys.argv[2])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from lightgrad_tpu.parallel import distributed
assert distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                              process_id=pid)

import numpy as np
import lightgrad_tpu as light
import lightgrad_tpu.nn as nn
from lightgrad_tpu.autograd import TpuTensor
from lightgrad_tpu.parallel import make_mesh, shard_module
from lightgrad_tpu.parallel.distributed import distribute_batch
from jax.sharding import PartitionSpec as P

mesh = make_mesh(dp=4)              # 2 hosts x 2 devices
np.random.seed(11)                  # identical init on both hosts
model = nn.Linear(8, 4)
shard_module(model, mesh, [(r".*", P())])   # replicate params globally
optim = light.optim.Adam(model.parameters(), lr=1e-2)

rng = np.random.default_rng(5)
full_x = rng.normal(size=(8, 8)).astype(np.float32)
full_y = rng.normal(size=(8, 4)).astype(np.float32)
lo, hi = pid * 4, (pid + 1) * 4     # each host feeds ITS half of the batch
x = TpuTensor(distribute_batch(mesh, full_x[lo:hi], P("dp")), requires_grad=False)
y = TpuTensor(distribute_batch(mesh, full_y[lo:hi], P("dp")), requires_grad=False)

def step():
    loss = light.loss.mse(model(x), y)
    optim.zero_grad()
    loss.backward()
    optim.step()
    return loss

fn = light.jit(step)
losses = [float(np.asarray(fn().data)) for _ in range(3)]
assert losses[-1] < losses[0], losses
# post-step params: read the LOCAL replica of each (replicated) parameter
sums = []
for n, p in model.named_parameters():
    local = np.asarray(p.data.addressable_shards[0].data)
    sums.append(f"{n}={local.sum():.8f}")
print(f"TRAIN_OK {pid} loss={losses[-1]:.8f} " + " ".join(sums), flush=True)
"""


_FSDP_CKPT_WORKER = r"""
import os, sys, time
port, pid, ckpt = sys.argv[1], int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from lightgrad_tpu.parallel import distributed
assert distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                              process_id=pid)

import numpy as np
import lightgrad_tpu as light
import lightgrad_tpu.nn as nn
from lightgrad_tpu.autograd import TpuTensor
from lightgrad_tpu.parallel import make_mesh, fsdp_module
from lightgrad_tpu.parallel.distributed import distribute_batch
from lightgrad_tpu.checkpoint import (save_checkpoint_sharded,
                                      load_checkpoint_sharded)
from jax.sharding import PartitionSpec as P

mesh = make_mesh(fsdp=4)            # 2 hosts x 2 devices

def build():
    np.random.seed(11)              # identical init on both hosts
    model = nn.Linear(16, 8)
    fsdp_module(model, mesh, min_size=16)
    optim = light.optim.Adam(model.parameters(), lr=1e-2)
    return model, optim

model, optim = build()
rng = np.random.default_rng(5)
full_x = rng.normal(size=(8, 16)).astype(np.float32)
full_y = rng.normal(size=(8, 8)).astype(np.float32)
lo, hi = pid * 4, (pid + 1) * 4
x = TpuTensor(distribute_batch(mesh, full_x[lo:hi], P("fsdp")), requires_grad=False)
y = TpuTensor(distribute_batch(mesh, full_y[lo:hi], P("fsdp")), requires_grad=False)

def make_step(model, optim):
    def step():
        loss = light.loss.mse(model(x), y)
        optim.zero_grad()
        loss.backward()
        optim.step()
        return loss
    return light.jit(step)

fn = make_step(model, optim)
[fn() for _ in range(2)]

def local_sums(model):
    out = {}
    for n, p in model.named_parameters():
        out[n] = [float(np.asarray(s.data).sum())
                  for s in p.data.addressable_shards]
    return out

before = local_sums(model)
save_checkpoint_sharded(ckpt, model, optim, step=2)
# this process wrote shards-{pid}.npz; wait for the peer's file + meta
deadline = time.time() + 120
want = [os.path.join(ckpt, f"shards-{i:05d}.npz") for i in range(2)] + \
       [os.path.join(ckpt, "meta.json")]
while not all(os.path.exists(f) for f in want):
    assert time.time() < deadline, "peer checkpoint files never appeared"
    time.sleep(0.2)

expected = float(make_step(model, optim)().item())   # trajectory oracle

model2, optim2 = build()
meta = load_checkpoint_sharded(ckpt, model2, optim2)
assert int(meta["step"]) == 2
after = local_sums(model2)
assert before == after, (before, after)   # bit-exact local shards restored
resumed = float(make_step(model2, optim2)().item())
np.testing.assert_allclose(resumed, expected, rtol=1e-6, atol=1e-8)
print(f"CKPT_OK {pid} loss={resumed:.8f}", flush=True)
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


@pytest.mark.skipif(sys.platform != "linux", reason="gloo loopback lane")
def test_two_process_train_step(tmp_path):
    """Full shard_module'd + light.jit'd training across 2 processes: each
    host feeds half the global batch; after 3 optimizer steps both hosts hold
    IDENTICAL parameters that match the single-process oracle (VERDICT r2
    #8 / ROADMAP 'Parallelism' #3)."""
    script = tmp_path / "train_worker.py"
    script.write_text(_TRAIN_WORKER)
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
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
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    lines = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"TRAIN_OK {i}" in out, out
        lines.append(out.split(f"TRAIN_OK {i} ")[1].splitlines()[0])
    # bit-identical post-step params (and loss) on both hosts
    assert lines[0] == lines[1], (lines[0], lines[1])

    # single-process oracle: same seeds, plain single-device training
    import jax

    import lightgrad_tpu as light
    import lightgrad_tpu.nn as nn
    from lightgrad_tpu.autograd import TpuTensor

    np.random.seed(11)
    model = nn.Linear(8, 4)
    optim = light.optim.Adam(model.parameters(), lr=1e-2)
    rng = np.random.default_rng(5)
    x = TpuTensor.from_numpy(rng.normal(size=(8, 8)).astype(np.float32),
                             requires_grad=False)
    y = TpuTensor.from_numpy(rng.normal(size=(8, 4)).astype(np.float32),
                             requires_grad=False)
    for _ in range(3):
        loss = light.loss.mse(model(x), y)
        optim.zero_grad()
        loss.backward()
        optim.step()
    want = {n: float(p.numpy().sum()) for n, p in model.named_parameters()}
    got = dict(kv.split("=") for kv in lines[0].split()[1:])
    for n, v in want.items():
        np.testing.assert_allclose(float(got[n]), v, rtol=1e-5, atol=1e-6,
                                   err_msg=n)


@pytest.mark.skipif(sys.platform != "linux", reason="gloo loopback lane")
def test_two_process_fsdp_sharded_checkpoint(tmp_path):
    """FSDP training across 2 processes checkpoints via each process writing
    ONLY its owned shards, then resumes bit-exactly on both hosts (local
    shard sums identical pre/post, next-step loss matches the uninterrupted
    trajectory)."""
    script = tmp_path / "ckpt_worker.py"
    script.write_text(_FSDP_CKPT_WORKER)
    ckpt = str(tmp_path / "ck")
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = ""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(i), ckpt],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    lines = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"CKPT_OK {i}" in out, out
        lines.append(out.split(f"CKPT_OK {i} ")[1].splitlines()[0])
    # the resumed loss is the SAME global value on both hosts
    assert lines[0] == lines[1], (lines[0], lines[1])
    # and each process's file holds only shard-sized pieces of the weight:
    # (8, 16) fsdp=4 shards the largest dim -> (8, 4) per device, 2 per host
    with np.load(os.path.join(ckpt, "shards-00000.npz")) as z:
        w_shapes = [z[k].shape for k in z.files if k.startswith("weight//")]
    assert w_shapes and all(s == (8, 4) for s in w_shapes), w_shapes
