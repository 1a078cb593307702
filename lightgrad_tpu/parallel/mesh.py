"""Device-mesh construction.

The reference framework is single-device (SURVEY.md §2.3: no DP/TP/PP and no
collectives backend); multi-chip is this framework's TPU-native extension:
``jax.sharding.Mesh`` + GSPMD partitioning over ICI, instead of a hand-rolled
NCCL/MPI layer.  Collectives are inserted by XLA from sharding annotations --
the scaling-book recipe: pick a mesh, annotate, let the compiler place
all-reduces on the interconnect.
"""

import numpy as np
import jax
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(dp: int = 1, tp: int = 1, devices=None, **extra_axes) -> Mesh:
    """Build a mesh over the first prod(sizes) devices.

    Default axes are ``(dp, tp)``; extra named axes (e.g. ``sp=2`` for
    sequence sharding, ``pp=2`` for pipeline stages) append in kwarg order.
    """
    sizes = {"dp": dp, "tp": tp, **extra_axes}
    devices = list(devices if devices is not None else jax.devices())
    need = int(np.prod(list(sizes.values())))
    assert need <= len(devices), f"need {need} devices, have {len(devices)}"
    arr = np.array(devices[:need]).reshape(tuple(sizes.values()))
    return Mesh(arr, tuple(sizes.keys()))
