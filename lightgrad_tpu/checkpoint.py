"""Checkpoint save / resume.

The reference has only a *load* path (torch-pickle reader + Module.load_
parameters, SURVEY.md §5 "checkpoint/resume -- PARTIAL").  This module
completes the capability: save/load of model parameters *and* optimizer state
(moments, step counter) to a single compressed npz archive, so training can
resume bit-exactly.  Torch-format checkpoints remain importable through
``lightgrad_tpu.utils.load_torch_state_dict``.

``save_checkpoint_sharded`` / ``load_checkpoint_sharded`` add the
distributed tier: each process writes only the array shards it owns
(``addressable_shards``, replica 0), so an FSDP/TP-sharded model checkpoints
without ever materializing a full parameter on any host, and resume
device_puts each shard straight back to its device when the live sharding
matches the saved layout.
"""

import io
import json
import os

import numpy as np

from .autograd import AbstractTensor
from .nn import Module
from .optim import Optimizer, SGD, Adam

__all__ = ["save_checkpoint", "load_checkpoint", "optimizer_state_dict",
           "load_optimizer_state", "save_checkpoint_sharded",
           "load_checkpoint_sharded"]

_OPT_PREFIX = "__optim__/"
_META_PREFIX = "__meta__/"


def optimizer_state_dict(optim: Optimizer) -> dict:
    """Flatten optimizer state to name -> ndarray."""
    state = {}
    if isinstance(optim, Adam):
        state["t"] = optim.t.numpy()
        for i, (m, v) in enumerate(zip(optim.m, optim.v)):
            state[f"m.{i}"] = m.numpy()
            state[f"v.{i}"] = v.numpy()
    elif isinstance(optim, SGD) and optim.velocity is not None:
        for i, vel in enumerate(optim.velocity):
            state[f"velocity.{i}"] = vel.numpy()
    return state


def load_optimizer_state(optim: Optimizer, state: dict) -> None:
    def _assign(t: AbstractTensor, arr):
        t._set_data(type(t).from_numpy(arr).data)

    if isinstance(optim, Adam):
        if "t" in state:
            _assign(optim.t, state["t"])
        for i in range(len(optim.parameters)):
            if f"m.{i}" in state:
                _assign(optim.m[i], state[f"m.{i}"])
                _assign(optim.v[i], state[f"v.{i}"])
    elif isinstance(optim, SGD) and optim.velocity is not None:
        for i in range(len(optim.parameters)):
            if f"velocity.{i}" in state:
                _assign(optim.velocity[i], state[f"velocity.{i}"])


def save_checkpoint(path: str, model: Module, optim: Optimizer = None,
                    step: int = None, **extra) -> None:
    """Atomically write model (+ optimizer) state to ``path`` (npz)."""
    arrays = dict(model.state_dict())
    if optim is not None:
        for k, v in optimizer_state_dict(optim).items():
            arrays[_OPT_PREFIX + k] = v
    if step is not None:
        arrays[_META_PREFIX + "step"] = np.asarray(step)
    for k, v in extra.items():
        arrays[_META_PREFIX + k] = np.asarray(v)
    # npz cannot serialize ml_dtypes (bfloat16 silently round-trips as raw
    # void bytes); widen to f32 -- exact for bf16 -- and rely on
    # load_parameters casting back to each destination parameter's dtype.
    arrays = {
        k: v.astype(np.float32) if v.dtype.kind == "V" else v
        for k, v in arrays.items()
    }
    buf = io.BytesIO()
    np.savez_compressed(buf, **arrays)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)


def load_checkpoint(path: str, model: Module, optim: Optimizer = None) -> dict:
    """Restore model (+ optimizer) state; returns the meta dict."""
    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files}
    params = {k: v for k, v in arrays.items()
              if not k.startswith((_OPT_PREFIX, _META_PREFIX))}
    model.load_parameters(params)
    if optim is not None:
        opt_state = {
            k[len(_OPT_PREFIX):]: v
            for k, v in arrays.items() if k.startswith(_OPT_PREFIX)
        }
        load_optimizer_state(optim, opt_state)
    return {
        k[len(_META_PREFIX):]: v
        for k, v in arrays.items() if k.startswith(_META_PREFIX)
    }


# --------------------------- sharded checkpoints ---------------------------

def _optimizer_state_tensors(optim: Optimizer) -> dict:
    """Generic name -> tensor walk over an optimizer's state.

    Every optimizer in this package keeps its state as tape tensors (or lists
    of them) in instance attributes (optim.py `_zeros_like`), so a structural
    walk covers all of them -- Adam moments, Adafactor row/col factors, Lion
    momentum, RMSprop accumulators -- without per-class registries."""
    out = {}
    for attr, val in sorted(vars(optim).items()):
        if attr == "parameters" or attr.startswith("_"):
            continue
        if isinstance(val, AbstractTensor):
            out[attr] = val
        elif isinstance(val, (list, tuple)) and val and \
                all(isinstance(x, (AbstractTensor, type(None))) for x in val):
            for i, x in enumerate(val):
                if x is not None:
                    out[f"{attr}.{i}"] = x
    return out


def _named_state_tensors(model: Module, optim: Optimizer = None) -> dict:
    out = dict(model.named_parameters())
    out.update({"__buf__/" + n: b for n, b in model.named_buffers()})
    if optim is not None:
        out.update({_OPT_PREFIX + k: t
                    for k, t in _optimizer_state_tensors(optim).items()})
    return out


def _index_key(index, shape) -> str:
    """Canonical 'start:stop,start:stop' key for a shard's global slice."""
    return ",".join(f"{s.indices(d)[0]}:{s.indices(d)[1]}"
                    for s, d in zip(index, shape))  # "" for 0-d scalars


def _widen(arr: np.ndarray) -> np.ndarray:
    """npz cannot serialize ml_dtypes (bf16 et al.); widen to f32 (exact for
    bf16).  The saved dtype string in meta.json casts it back on load."""
    return arr.astype(np.float32) if arr.dtype.kind not in "biufc" else arr


def save_checkpoint_sharded(dir_path: str, model: Module,
                            optim: Optimizer = None, step: int = None,
                            **extra) -> None:
    """Write each process's OWNED shards (replica 0) of every model/optimizer
    tensor to ``dir_path/shards-{process:05d}.npz`` + a ``meta.json``.

    Unlike ``save_checkpoint`` (which calls ``.numpy()`` and therefore
    all-gathers every parameter to every host), per-host traffic and memory
    are 1/N for FSDP/TP-sharded state.  All processes must call this
    (each writes its own file); rank 0 writes the metadata."""
    import jax

    os.makedirs(dir_path, exist_ok=True)
    proc = jax.process_index()
    tensors = _named_state_tensors(model, optim)
    entries, arrays = {}, {}
    for name, t in tensors.items():
        a = t.data
        if not hasattr(a, "addressable_shards"):  # host (numpy) backend
            arr = _widen(np.asarray(a))
            entries[name] = {"shape": list(np.shape(a)),
                             "dtype": str(np.asarray(a).dtype)}
            key = ",".join(f"0:{d}" for d in np.shape(a))
            arrays[f"{name}//{key}"] = arr
            continue
        entries[name] = {"shape": list(a.shape), "dtype": str(a.dtype)}
        for shard in a.addressable_shards:
            if shard.replica_id != 0:
                continue
            arr = _widen(np.asarray(shard.data))
            arrays[f"{name}//{_index_key(shard.index, a.shape)}"] = arr
    buf = io.BytesIO()
    np.savez_compressed(buf, **arrays)
    tmp = os.path.join(dir_path, f".shards-{proc:05d}.tmp")
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, os.path.join(dir_path, f"shards-{proc:05d}.npz"))
    if proc == 0:
        meta = {"format": 1, "entries": entries,
                "meta": {k: (int(v) if isinstance(v, (int, np.integer)) else v)
                         for k, v in dict(step=step, **extra).items()
                         if v is not None}}
        tmp = os.path.join(dir_path, ".meta.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(dir_path, "meta.json"))


def _parse_key(key: str):
    name, _, idx = key.rpartition("//")
    slices = tuple(slice(int(a), int(b)) for a, b in
                   (part.split(":") for part in idx.split(",") if part))
    return name, slices


def load_checkpoint_sharded(dir_path: str, model: Module,
                            optim: Optimizer = None) -> dict:
    """Restore state saved by ``save_checkpoint_sharded``.

    Fast path: when a tensor's live sharding covers exactly the saved shard
    slices, each shard is device_put straight to its device
    (``jax.make_array_from_single_device_arrays``) -- no full-size host
    array is ever built.  Otherwise the tensor is assembled on host and
    re-placed through the destination's existing sharding."""
    import jax

    with open(os.path.join(dir_path, "meta.json")) as f:
        meta = json.load(f)
    saved = {}  # name -> {slices: ndarray}
    import glob
    for path in sorted(glob.glob(os.path.join(dir_path, "shards-*.npz"))):
        with np.load(path) as z:
            for key in z.files:
                name, slices = _parse_key(key)
                saved.setdefault(name, {})[slices] = z[key]

    tensors = _named_state_tensors(model, optim)
    for name, info in meta["entries"].items():
        if name not in tensors:
            continue  # e.g. optimizer state saved but no optimizer passed
        t = tensors[name]
        shards = saved.get(name, {})
        assert shards, f"checkpoint has no shards for {name}"
        shape, dtype = tuple(info["shape"]), info["dtype"]
        a = t.data
        live = getattr(a, "sharding", None)
        # only mesh-sharded tensors take the committed per-device paths: a
        # single-device tensor must come back UNCOMMITTED (from_numpy), or
        # the next jit mixing it with mesh-sharded params raises
        # "incompatible devices" (a committed device-0 scalar cannot join an
        # 8-device program; uncommitted follows the computation)
        from jax.sharding import NamedSharding as _NS
        if not isinstance(live, _NS):
            live = None
        if live is not None and hasattr(a, "addressable_shards"):
            want = {_parse_key(f"x//{_index_key(s.index, shape)}")[1]
                    for s in a.addressable_shards}
            if want <= set(shards):
                per_dev = []
                for s in a.addressable_shards:
                    arr = shards[_parse_key(
                        f"x//{_index_key(s.index, shape)}")[1]]
                    per_dev.append(jax.device_put(
                        arr.astype(a.dtype), s.device))
                new = jax.make_array_from_single_device_arrays(
                    shape, live, per_dev)
                t._set_data(new)
                continue
        # assemble on host (sharding changed between save and resume)
        first = next(iter(shards.values()))
        full = np.empty(shape, dtype=first.dtype)
        for slices, arr in shards.items():
            full[slices if slices else ...] = arr
        new = type(t).from_numpy(full).data
        if hasattr(new, "astype") and str(new.dtype) != dtype:
            new = new.astype(dtype)
        if live is not None:
            new = jax.device_put(new, live)
        t._set_data(new)
    return meta.get("meta", {})
