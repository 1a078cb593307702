from .grads import Gradients, no_grad
from .function import Function, composite
from .tensor import AbstractTensor
from . import ops  # install device-agnostic derived ops / dunders
from .cpu import CpuTensor
from .tpu import TpuTensor

# default tensor: the TPU backend (single-chip jax.Array storage); the
# reference defaults to its CPU tensor, but this framework is TPU-native --
# CpuTensor remains the test oracle.
Tensor = TpuTensor
