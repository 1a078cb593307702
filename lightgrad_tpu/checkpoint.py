"""Checkpoint save / resume.

The reference has only a *load* path (torch-pickle reader + Module.load_
parameters, SURVEY.md §5 "checkpoint/resume -- PARTIAL").  This module
completes the capability: save/load of model parameters *and* optimizer state
(moments, step counter) to a single compressed npz archive, so training can
resume bit-exactly.  Torch-format checkpoints remain importable through
``lightgrad_tpu.utils.load_torch_state_dict``.
"""

import io
import os

import numpy as np

from .autograd import AbstractTensor
from .nn import Module
from .optim import Optimizer, SGD, Adam

__all__ = ["save_checkpoint", "load_checkpoint", "optimizer_state_dict",
           "load_optimizer_state"]

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
