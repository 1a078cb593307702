"""Mixed/low-precision training.

Three levers, all measured on v5e (the reference is hard-f32 throughout,
``/root/reference/lightgrad/autograd/cpu/tensor.py:6`` -- this module is the
"beat the reference" precision axis):

* :func:`set_matmul_precision` -- keep f32 parameters but run MXU passes at
  bf16 ('default') instead of the 6-pass f32 emulation ('highest').  Safe
  default for inference and most training; gradcheck-grade accuracy needs
  'highest'.
* :func:`cast_module` -- cast parameters/activations to bfloat16 end to end
  (halves HBM traffic).
* :class:`MixedPrecision` -- the full master-weight AMP recipe: bf16 compute
  parameters + activations, f32 master weights owned by the optimizer, and
  optional :class:`GradScaler` loss scaling.  Every piece of state (masters,
  scale, growth counter, skip gate) is tensor-resident, so the whole AMP
  training step compiles under ``lightgrad_tpu.jit`` with no data-dependent
  python control flow.

Note on loss scaling: bf16 shares f32's exponent range, so overflow-driven
scaling is rarely needed on TPU (it is an fp16 artifact).  The scaler is
still provided -- and tested -- for numerical safety nets and fp16-style
policies; ``MixedPrecision`` works with ``scaler=None`` as the default.
"""

import numpy as np
import jax.numpy as jnp

from .ops import matmul as _matmul

__all__ = ["set_matmul_precision", "cast_module", "GradScaler", "MixedPrecision"]


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
        _mirror_host_value(p, q)
        return q.detach()._set_requires_grad(p.requires_grad)

    return module.map_parameters(cast)


def _mirror_host_value(src, dst):
    """Carry a host-born value cache through a dtype cast: the jit recorder's
    CPU staging (jit.py) then rebuilds ``dst``'s buffer locally instead of
    pulling it through the device link.  Host-side numpy astype uses the same
    round-to-nearest-even as the device cast."""
    hv = getattr(src, "_host_value", None)
    if hv is not None and hasattr(dst, "_host_value"):
        import numpy as np

        dst._host_value = hv.astype(np.dtype(dst.dtype))


class GradScaler:
    """Dynamic loss scaling with tensor-resident state (jit-compilable).

    ``scale(loss)`` multiplies by the current scale; after backward,
    :class:`MixedPrecision` (or a manual caller) computes a finite-gate and
    calls :meth:`update`.  On an overflow step the scale is multiplied by
    ``backoff_factor``; after ``growth_interval`` consecutive good steps it
    is multiplied by ``growth_factor``.  All updates are scalar tensor
    arithmetic -- no host readbacks, no python branches -- so the scaler
    lives inside a compiled training step.
    """

    def __init__(self, init_scale: float = 2.0 ** 15, growth_factor: float = 2.0,
                 backoff_factor: float = 0.5, growth_interval: int = 2000,
                 enabled: bool = True):
        self.enabled = enabled
        self._init = float(init_scale)
        self._gf, self._bf = float(growth_factor), float(backoff_factor)
        self._gi = int(growth_interval)
        self._scale = None   # scalar tensor, lazily created on first use
        self._count = None   # consecutive good steps

    def _materialize(self, cls):
        # must run BEFORE a wrapping light.jit records (MixedPrecision's
        # constructor calls this): tensors created inside the recorded step
        # are not captured as runtime inputs
        if self._scale is None:
            self._scale = cls.from_numpy(
                np.asarray(self._init, np.float32), requires_grad=False)
            self._count = cls.zeros((), requires_grad=False)

    def scale(self, loss):
        if not self.enabled:
            return loss
        self._materialize(type(loss))
        return loss * self._scale

    def inv_scale(self, like_cls):
        if not self.enabled:
            return None
        self._materialize(like_cls)
        return self._scale ** -1.0

    def update(self, ok) -> None:
        """``ok``: scalar {0,1} tensor -- 1 iff every gradient was finite."""
        if not self.enabled:
            return
        self._materialize(type(ok))
        from .autograd import Gradients

        with Gradients.no_grad():
            grown = (self._count + 1.0).ge(float(self._gi))  # {0,1}
            new_scale = self._scale * (
                ok * (1.0 + (self._gf - 1.0) * grown) + (1.0 - ok) * self._bf
            )
            new_count = (self._count + 1.0) * ok * (1.0 - grown)
            self._scale._set_data(new_scale.data)
            self._count._set_data(new_count.data)

    def scale_value(self) -> float:
        return float(self._scale.item()) if self._scale is not None else self._init


class MixedPrecision:
    """Master-weight AMP: bf16 compute, f32 master weights, loss scaling.

    Usage::

        model = TwoLayer()
        mp = amp.MixedPrecision(model, lambda ps: optim.Adam(ps, lr=1e-3))
        step = light.jit(train_step)       # train_step uses mp.zero_grad /
        ...                                # mp.scale(loss).backward() / mp.step()

    The constructor snapshots f32 **masters** of every parameter, then casts
    the module's parameters (and therefore its activations) to
    ``compute_dtype``.  ``step()`` upcasts+unscales the bf16 grads onto the
    masters, gate-skips non-finite steps (algebraically -- see
    ``Optimizer._gate``), runs the wrapped optimizer on the masters, and
    re-quantizes masters -> compute params.  bf16 rounding error therefore
    never accumulates across steps (the reference-beating property plain
    ``cast_module`` training lacks).
    """

    def __init__(self, model, optimizer_factory, compute_dtype=jnp.bfloat16,
                 scaler: GradScaler = None):
        from .autograd import Gradients

        self.model = model
        self.compute_dtype = compute_dtype
        self.scaler = scaler
        with Gradients.no_grad():
            self.masters = []
            for p in model.parameters():
                m = p.astype(jnp.float32).detach()._set_requires_grad(True)
                _mirror_host_value(p, m)
                self.masters.append(m)
        cast_module(model, compute_dtype)
        self.compute_params = list(model.parameters())
        assert len(self.compute_params) == len(self.masters)
        self.optim = optimizer_factory(self.masters)
        # materialize scaler state NOW: tensor state created lazily inside
        # the first step is invisible to the jit step-compiler's capture set
        # (it would be baked as a constant -- scale/count frozen at their
        # step-1 values under eager recording, zeroed under abstract
        # discovery).  Pre-created state is captured and donated like
        # optimizer moments, so dynamic scale growth works inside jit.
        if scaler is not None and self.masters:
            scaler._materialize(type(self.masters[0]))

    def zero_grad(self):
        for p in self.compute_params:
            p.zero_grad()

    def scale(self, loss):
        return self.scaler.scale(loss) if self.scaler is not None else loss

    def step(self):
        from .autograd import Gradients

        with Gradients.no_grad():
            # finite gate: (g*0)==0 is 1 for finite, 0 for nan/inf entries
            ok = None
            for p in self.compute_params:
                fin = (p.grad * 0.0).eq(0.0).min()
                ok = fin if ok is None else ok * fin
            inv = (self.scaler.inv_scale(type(ok))
                   if self.scaler is not None else None)
            for p, m in zip(self.compute_params, self.masters):
                g32 = p.grad.astype(jnp.float32).nan_to_num()
                if inv is not None:
                    g32 = g32 * inv
                m.zero_grad()
                m.add_grad(g32)
            self.optim._gate = ok
            try:
                self.optim.step()
            finally:
                self.optim._gate = None
            for p, m in zip(self.compute_params, self.masters):
                p._set_data(m.astype(self.compute_dtype).data)
        if self.scaler is not None:
            self.scaler.update(ok)
