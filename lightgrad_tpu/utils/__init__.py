from .profiler import Profiler, Tracker
from .fetch import fetch
from .torch_loader import load_torch_state_dict

# gradcheck lives in lightgrad_tpu.utils.gradcheck; imported lazily because it
# depends on the autograd core (which itself imports the profiler from here)
from .torch_saver import save_torch_state_dict
