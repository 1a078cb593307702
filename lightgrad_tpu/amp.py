"""Mixed/low-precision helpers.

Two independent levers, both measured on v5e:

* :func:`set_matmul_precision` -- keep f32 parameters but run MXU passes at
  bf16 ('default') instead of the 6-pass f32 emulation ('highest').  Safe
  default for inference and most training; gradcheck-grade accuracy needs
  'highest'.
* :func:`cast_module` -- cast parameters/activations to bfloat16 end to end
  (halves HBM traffic; the full master-weight AMP recipe is on the roadmap).
"""

import jax.numpy as jnp

from .ops import matmul as _matmul

__all__ = ["set_matmul_precision", "cast_module"]


def set_matmul_precision(p: str) -> str:
    """'highest' (full f32, default) or 'default' (bf16 MXU passes)."""
    return _matmul.set_precision(p)


def cast_module(module, dtype=jnp.bfloat16):
    """Cast every parameter of a Module to ``dtype`` (in place).

    Activations follow the parameter dtype through the op layer.  Use
    ``cast_module(m, jnp.float32)`` to cast back.
    """
    from .autograd import Gradients

    def cast(p):
        with Gradients.no_grad():
            q = p.astype(dtype)
        return q.detach()._set_requires_grad(p.requires_grad)

    return module.map_parameters(cast)
