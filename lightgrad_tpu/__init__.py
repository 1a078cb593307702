"""lightgrad_tpu -- a TPU-native define-by-run autograd framework.

Built from scratch with the capability surface of ndoll1998/lightgrad
(see SURVEY.md): a pure-Python eager tape over backend tensors, where the TPU
backend's compute path is hand-written Pallas kernels + XLA, and whole
training steps can be fused into single XLA programs with
:func:`lightgrad_tpu.jit`.
"""

import os as _os

# Silence XLA C++ ERROR-level log flood before jaxlib loads: the XLA:CPU
# AOT cache loader prints one multi-KB machine-feature message per cache
# hit (cpu_aot_loader.cc) even though the entry loads and runs fine --
# with the persistent compile cache on (ops/runtime.py) that is thousands
# of lines per warm run.  Python exceptions still surface XLA failures;
# export TF_CPP_MIN_LOG_LEVEL yourself to override.
_os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

# Platform escape hatch: the axon TPU plugin ignores JAX_PLATFORMS, so on a
# host with a contended/wedged tunnel a CPU-sized script (examples/
# gradient_descent.py is a 1-second workload) can hang indefinitely grabbing
# the TPU.  LIGHTGRAD_PLATFORM=cpu applies the jax.config workaround the
# test harness already uses (tests/conftest.py) before any backend
# initializes.  Values: any jax_platforms string ("cpu", "tpu", ...).
_platform = _os.environ.get("LIGHTGRAD_PLATFORM")
if _platform:
    import jax as _jax

    _jax.config.update("jax_platforms", _platform)

from . import data, loss, nn, optim, autograd
from .autograd import (
    Tensor,
    CpuTensor,
    TpuTensor,
    AbstractTensor,
    Gradients,
    Function,
    no_grad,
)
from .utils.profiler import Profiler
from .autograd.tpu.tensor import set_device_init
from .jit import jit
from . import amp, random, checkpoint, parallel, schedule, quant, lora
from . import serving

# tensor initializer shortcuts (parity: reference lightgrad/__init__.py)
empty, zeros, ones = Tensor.empty, Tensor.zeros, Tensor.ones
uniform, xavier = Tensor.uniform, Tensor.xavier
from_numpy = Tensor.from_numpy


def einsum(spec: str, *operands):
    """``light.einsum("ab,bc->ac", a, b)`` -- differentiable contraction
    (method form: ``a.einsum(spec, b)``; grammar in autograd/einsum_spec.py)."""
    return operands[0].einsum(spec, *operands[1:])

__version__ = "0.1.0"
