"""TPU device runtime helpers.

The analogue of the reference's OpenCL device pool
(``/root/reference/lightgrad/autograd/opencl/device.py``: platform discovery,
memoized default device, per-device tensor classes).  On TPU the runtime is
jax's: devices are discovered by the PJRT plugin, buffers are placed with
``device_put``, and multi-device execution goes through ``jax.sharding``
meshes (see ``lightgrad_tpu.parallel``) rather than per-device tensor
subclasses.
"""

import jax

__all__ = ["devices", "default_device", "device_count", "to_device", "synchronize"]


def devices(platform: str = None):
    """All accelerator devices (optionally filtered by platform name)."""
    return jax.devices(platform) if platform else jax.devices()


def default_device():
    return jax.devices()[0]


def device_count() -> int:
    return len(jax.devices())


def to_device(t, device):
    """Move a TpuTensor's buffer to a specific device (in place)."""
    return t._set_data(jax.device_put(t.data, device))


def synchronize(t=None) -> None:
    """Block until outstanding work on ``t`` (or the last op) completes."""
    from .tensor import _LAST

    target = t.data if t is not None else _LAST[0]
    if target is not None:
        jax.block_until_ready(target)
