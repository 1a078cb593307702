from .tensor import TpuTensor
from . import ops  # registers the TPU op set onto TpuTensor
from . import device
