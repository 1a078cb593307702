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


def make_mesh(dp: int = 1, tp: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp) mesh over the first dp*tp available devices."""
    devices = list(devices if devices is not None else jax.devices())
    need = dp * tp
    assert need <= len(devices), f"need {need} devices, have {len(devices)}"
    arr = np.array(devices[:need]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))
