"""Optimizers: SGD / Adam / AdamW / AdaBelief / Lion.

API parity with ``/root/reference/lightgrad/optim.py`` (``compute_delta``
contract, ``p += delta`` under no_grad).  Re-designed for TPU step fusion:
optimizer state is materialized as tensors up-front (``_init_state``) and all
updates go through tensor ops, so the whole ``step()`` -- and the training
step around it -- can be captured by ``lightgrad_tpu.jit`` into a single XLA
program (the reference launched ~8 kernels per parameter per step,
SURVEY.md §3.3).
"""

import numpy as np

from .autograd import Gradients, AbstractTensor

__all__ = ["Optimizer", "SGD", "Adam", "AdamW", "AdaBelief", "Lion",
           "RMSprop", "Adagrad", "Adafactor", "Muon", "EMA"]


class Optimizer:
    def __init__(self, parameters):
        self.parameters = tuple(parameters)
        assert all(isinstance(p, AbstractTensor) for p in self.parameters)
        # optional scalar {0,1} tensor set by amp.MixedPrecision: a 0 gate
        # algebraically skips the step (params AND optimizer state untouched)
        # without data-dependent python control flow, so gated steps stay
        # jit-compilable
        self._gate = None

    def zero_grad(self):
        for p in self.parameters:
            p.zero_grad()

    @Gradients.no_grad()
    def step(self):
        for i, p in enumerate(self.parameters):
            d = self.compute_delta(p.grad, i)
            p += d * self._gate if self._gate is not None else d

    def compute_delta(self, grad, idx):
        raise NotImplementedError()

    def _zeros_like(self, p):
        z = type(p).zeros(p.shape, requires_grad=False)
        # inherit the parameter's device placement/sharding so the compiled
        # step starts SPMD-consistent (avoids a resharding round-trip)
        if hasattr(p.data, "sharding") and hasattr(z.data, "sharding"):
            import jax

            z._set_data(jax.device_put(z.data, p.data.sharding))
        return z


class SGD(Optimizer):
    """Stochastic gradient descent with optional momentum and L2 weight decay
    (torch-style: decay is folded into the gradient before momentum)."""

    def __init__(self, parameters, lr: float, momentum: float = 0.0,
                 weight_decay: float = 0.0):
        super().__init__(parameters)
        self.lr, self.momentum, self.wd = lr, momentum, weight_decay
        self.velocity = [self._zeros_like(p) for p in self.parameters] if momentum else None

    def compute_delta(self, grad, i):
        if self.wd:
            grad = grad + self.parameters[i] * self.wd
        if self.velocity is None:
            return grad * (-self.lr)
        v = self.velocity[i]
        if self._gate is None:
            v *= self.momentum
            v += grad * (-self.lr)
        else:
            # gate==0 -> multiplier 1 and zero increment: velocity untouched
            v *= self.momentum * self._gate + (1.0 - self._gate)
            v += grad * (-self.lr) * self._gate
        return v


class Adam(Optimizer):
    """ADAptive Moment estimation.

    All state (including the step counter) lives in tensors so that a whole
    training step is traceable by ``lightgrad_tpu.jit`` -- a python-int step
    counter would be baked into the compiled program as a constant.
    """

    def __init__(self, parameters, lr: float, beta1: float = 0.9,
                 beta2: float = 0.999, eps: float = 1e-8):
        super().__init__(parameters)
        self.lr, self.b1, self.b2, self.eps = lr, beta1, beta2, eps
        proto = type(self.parameters[0]) if self.parameters else None
        self.t = proto.zeros((), requires_grad=False) if proto else None
        self.m = [self._zeros_like(p) for p in self.parameters]
        self.v = [self._zeros_like(p) for p in self.parameters]

    @Gradients.no_grad()
    def step(self):
        import numpy as np

        self.t += 1.0 if self._gate is None else self._gate
        # bias corrections: beta^t computed as exp(t * ln(beta)) in tensors.
        # t can be 0 when every step so far was gate-skipped: the denominator
        # is then exactly 0 -- bump it to 1 (moments are all-zero there, so
        # the correction value is irrelevant but must stay finite).
        d1 = 1.0 - (self.t * float(np.log(self.b1))).exp()
        d2 = 1.0 - (self.t * float(np.log(self.b2))).exp()
        self._bc1 = 1.0 / (d1 + d1.eq(0.0))
        self._bc2 = 1.0 / (d2 + d2.eq(0.0))
        super().step()

    def _second_moment_update(self, grad, i):
        return grad * grad

    def compute_delta(self, grad, i):
        m, v = self.m[i], self.v[i]
        if self._gate is None:
            m *= self.b1
            m += grad * (1 - self.b1)
            v *= self.b2
            v += self._second_moment_update(grad, i) * (1 - self.b2)
        else:
            g = self._gate
            m *= self.b1 * g + (1.0 - g)
            m += grad * ((1 - self.b1) * g)
            v *= self.b2 * g + (1.0 - g)
            v += self._second_moment_update(grad, i) * ((1 - self.b2) * g)
        m_hat = m * self._bc1
        v_hat = v * self._bc2
        return m_hat * (-self.lr) / (v_hat ** 0.5 + self.eps)


class AdamW(Adam):
    """Adam with DECOUPLED weight decay (https://arxiv.org/abs/1711.05101).

    The decay term ``-lr * wd * p`` is added to the delta directly instead of
    being folded into the gradient, so it does not pollute the moment
    estimates -- the production LLM-training configuration.  Under
    ``amp.MixedPrecision`` the parameters seen here are the f32 masters, so
    decay applies to masters (and the gate zeroes it on skipped steps via
    ``Optimizer.step``).  No counterpart in the reference (its optimizer set
    is SGD/Adam/AdaBelief, /root/reference/lightgrad/optim.py:17-52).
    """

    def __init__(self, parameters, lr: float, beta1: float = 0.9,
                 beta2: float = 0.999, eps: float = 1e-8,
                 weight_decay: float = 0.01):
        super().__init__(parameters, lr, beta1, beta2, eps)
        self.wd = weight_decay

    def compute_delta(self, grad, i):
        d = super().compute_delta(grad, i)
        if self.wd:
            d = d + self.parameters[i] * (-self.lr * self.wd)
        return d


class AdaBelief(Adam):
    """Adapting Stepsizes by the Belief in Observed Gradients
    (https://arxiv.org/abs/2010.07468)."""

    def _second_moment_update(self, grad, i):
        d = grad - self.m[i]
        return d * d


class Lion(Optimizer):
    """EvoLved Sign Momentum (https://arxiv.org/abs/2302.06675).

    Single-moment sign-based update: ``delta = -lr * sign(b1*m + (1-b1)*g)``
    then ``m = b2*m + (1-b2)*g``; decoupled weight decay like AdamW.  Half
    Adam's optimizer memory -- relevant on HBM-bound TPU training.  sign() is
    composed from the {0,1} comparison ops (``gt``), so the whole step stays
    a branch-free tensor program capturable by ``lightgrad_tpu.jit``.
    Validated against ``optax.lion`` (tests/test_nn.py).  No counterpart in
    the reference (/root/reference/lightgrad/optim.py has SGD/Adam/AdaBelief).
    """

    def __init__(self, parameters, lr: float = 1e-4, beta1: float = 0.9,
                 beta2: float = 0.99, weight_decay: float = 0.0):
        super().__init__(parameters)
        self.lr, self.b1, self.b2, self.wd = lr, beta1, beta2, weight_decay
        self.m = [self._zeros_like(p) for p in self.parameters]

    def compute_delta(self, grad, i):
        m = self.m[i]
        c = m * self.b1 + grad * (1 - self.b1)
        sign = c.gt(0.0) - (0.0 - c).gt(0.0)  # {-1, 0, +1}
        if self._gate is None:
            m *= self.b2
            m += grad * (1 - self.b2)
        else:  # gate==0 -> multiplier 1, zero increment: moment untouched
            g = self._gate
            m *= self.b2 * g + (1.0 - g)
            m += grad * ((1 - self.b2) * g)
        d = sign * (-self.lr)
        if self.wd:
            d = d + self.parameters[i] * (-self.lr * self.wd)
        return d


class RMSprop(Optimizer):
    """RMSprop with optional momentum and the centered variant (torch
    semantics: ``sq = a*sq + (1-a)*g^2``, denom ``sqrt(sq) + eps`` -- eps
    OUTSIDE the sqrt; centered subtracts the squared running mean first;
    the momentum buffer accumulates ``g/denom``).  Validated step-for-step
    against ``torch.optim.RMSprop`` (tests/test_nn.py).  No counterpart in
    the reference (/root/reference/lightgrad/optim.py)."""

    def __init__(self, parameters, lr: float = 1e-2, alpha: float = 0.99,
                 eps: float = 1e-8, momentum: float = 0.0,
                 centered: bool = False):
        super().__init__(parameters)
        self.lr, self.alpha, self.eps = lr, alpha, eps
        self.momentum, self.centered = momentum, centered
        self.sq = [self._zeros_like(p) for p in self.parameters]
        self.buf = ([self._zeros_like(p) for p in self.parameters]
                    if momentum else None)
        self.avg = ([self._zeros_like(p) for p in self.parameters]
                    if centered else None)

    def compute_delta(self, grad, i):
        g1 = 1.0 if self._gate is None else self._gate
        keep = 0.0 if self._gate is None else (1.0 - self._gate)
        sq = self.sq[i]
        sq *= self.alpha * g1 + keep
        sq += grad * grad * ((1 - self.alpha) * g1)
        if self.centered:
            avg = self.avg[i]
            avg *= self.alpha * g1 + keep
            avg += grad * ((1 - self.alpha) * g1)
            denom = (sq - avg * avg) ** 0.5 + self.eps
        else:
            denom = sq ** 0.5 + self.eps
        if self.buf is None:
            return grad * (-self.lr * g1) / denom
        buf = self.buf[i]
        buf *= self.momentum * g1 + keep
        buf += grad * g1 / denom
        return buf * (-self.lr * g1) if self._gate is not None \
            else buf * (-self.lr)


class Adagrad(Optimizer):
    """Adagrad: ``sum += g^2``, ``delta = -lr * g / (sqrt(sum) + eps)``
    (torch semantics, ``lr_decay=0``).  Validated against
    ``torch.optim.Adagrad`` (tests/test_nn.py).  No counterpart in the
    reference."""

    def __init__(self, parameters, lr: float = 1e-2, eps: float = 1e-10):
        super().__init__(parameters)
        self.lr, self.eps = lr, eps
        self.sum = [self._zeros_like(p) for p in self.parameters]

    def compute_delta(self, grad, i):
        g1 = 1.0 if self._gate is None else self._gate
        s = self.sum[i]
        s += grad * grad * g1
        return grad * (-self.lr * g1) / (s ** 0.5 + self.eps)


class Adafactor(Optimizer):
    """Adafactor (https://arxiv.org/abs/1804.04235): sublinear-memory
    adaptive optimizer -- THE classic for large TPU training runs (T5 etc.).

    Second moments of a matrix-shaped parameter are stored FACTORED: one
    row vector and one column vector (decay-averages of per-row / per-col
    mean squared gradients) whose rank-1 outer product reconstructs the
    per-element estimate -- O(n+m) optimizer memory instead of O(n*m).
    On HBM-bound TPU training this halves-to-quarters optimizer state vs
    Adam.  Matches ``optax.adafactor`` step-for-step (tests/test_nn.py):
    increasing decay ``1 - t^-0.8``, per-block RMS clipping, optional
    parameter-scale multiplication, optional momentum, decoupled decay.

    Like the other optimizers here, ALL state lives in tensors (the step
    counter included) so a whole training step compiles into one XLA
    program via ``lightgrad_tpu.jit``, and every state update is gateable
    by ``amp.MixedPrecision``'s {0,1} skip gate.
    """

    def __init__(self, parameters, lr: float = 1.0,
                 min_dim_size_to_factor: int = 128,
                 decay_rate: float = 0.8, clipping_threshold: float = 1.0,
                 scale_parameter: bool = True, momentum: float = 0.0,
                 weight_decay: float = 0.0, eps: float = 1e-30,
                 min_param_scale: float = 1e-3):
        super().__init__(parameters)
        self.lr, self.decay_rate, self.eps = lr, decay_rate, eps
        self.clip = clipping_threshold
        self.scale_parameter = scale_parameter
        self.min_param_scale = min_param_scale
        self.momentum, self.wd = momentum, weight_decay
        proto = type(self.parameters[0]) if self.parameters else None
        self.t = proto.zeros((), requires_grad=False) if proto else None
        # per-parameter: either (v_row, v_col, d0, d1) or a full v
        self.v_row, self.v_col, self.v, self._dims = [], [], [], []
        import numpy as np

        for p in self.parameters:
            dims = self._factored_dims(p.shape, min_dim_size_to_factor)
            self._dims.append(dims)
            if dims is not None:
                d1, d0 = dims
                vr = tuple(np.delete(p.shape, d0))
                vc = tuple(np.delete(p.shape, d1))
                self.v_row.append(type(p).zeros(vr, requires_grad=False))
                self.v_col.append(type(p).zeros(vc, requires_grad=False))
                self.v.append(None)
            else:
                self.v_row.append(None)
                self.v_col.append(None)
                self.v.append(self._zeros_like(p))
        self.m = ([self._zeros_like(p) for p in self.parameters]
                  if momentum else None)

    @staticmethod
    def _factored_dims(shape, min_size):
        """The two LARGEST axes (optax convention), or None if the
        second-largest is below the factoring threshold."""
        import numpy as np

        if len(shape) < 2:
            return None
        order = np.argsort(shape)
        if shape[order[-2]] < min_size:
            return None
        return int(order[-2]), int(order[-1])

    @Gradients.no_grad()
    def step(self):
        self.t += 1.0 if self._gate is None else self._gate
        # increasing decay 1 - t^-0.8; t==0 only if every step was
        # gate-skipped -- guard 0^-0.8 = inf from poisoning the multiplier
        t_safe = self.t + self.t.eq(0.0)
        self._dr = 1.0 - t_safe ** (-self.decay_rate)
        super().step()

    def compute_delta(self, grad, i):
        g1 = 1.0 if self._gate is None else self._gate
        keep = 0.0 if self._gate is None else (1.0 - self._gate)
        dr = self._dr
        shape = grad.shape
        gsq = grad * grad + self.eps
        if self._dims[i] is not None:
            d1, d0 = self._dims[i]
            vr, vc = self.v_row[i], self.v_col[i]
            vr *= dr * g1 + keep
            vr += gsq.mean(axis=d0) * ((1.0 - dr) * g1)
            vc *= dr * g1 + keep
            vc += gsq.mean(axis=d1) * ((1.0 - dr) * g1)
            # rank-1 reconstruction, row side normalized by its mean
            reduced_d1 = d1 - 1 if d1 > d0 else d1
            row_mean = vr.mean(axis=reduced_d1, keepdims=True)
            rf_shape = list(shape)
            rf_shape[d0] = 1
            cf_shape = list(shape)
            cf_shape[d1] = 1
            u = grad * (vr / row_mean).reshape(*rf_shape) ** -0.5 \
                * vc.reshape(*cf_shape) ** -0.5
        else:
            v = self.v[i]
            v *= dr * g1 + keep
            v += gsq * ((1.0 - dr) * g1)
            u = grad * v ** -0.5
        if self.clip:
            # per-block RMS clipping: u /= max(1, rms(u)/threshold)
            rms_u = (u * u).mean() ** 0.5
            over = rms_u.gt(self.clip)
            u = u * (over * (self.clip / (rms_u + self.eps))
                     + (1.0 - over))
        u = u * self.lr
        if self.scale_parameter:
            # relative step: scale by max(rms(p), min_param_scale)
            p = self.parameters[i]
            rms_p = (p * p).mean() ** 0.5
            big = rms_p.gt(self.min_param_scale)
            u = u * (big * rms_p + (1.0 - big) * self.min_param_scale)
        if self.m is not None:
            m = self.m[i]
            m *= self.momentum * g1 + keep
            m += u * ((1.0 - self.momentum) * g1)
            u = m
        if self.wd:
            u = u + self.parameters[i] * self.wd
        return u * -1.0


class Muon(Optimizer):
    """Muon: momentum + Newton-Schulz orthogonalization of the update
    (Jordan et al. 2024, https://kellerjordan.github.io/posts/muon/).

    For matrix-shaped parameters the momentum buffer is orthogonalized with
    a 5th-order Newton-Schulz iteration -- ``ns_steps`` matmuls of the
    parameter's own shape, so the optimizer itself runs on the MXU (this is
    the rare optimizer that is *matmul*-bound, a natural fit for TPU).
    Conv kernels are flattened to (out, in*kh*kw) for the orthogonalization,
    like the reference implementation.  Parameters with ndim < 2 (biases,
    norm gains) fall back to AdamW with its own hyperparameters, matching
    Muon-practice (embeddings/scalars are not orthogonalizable).

    State is tensor-resident, so the whole step fuses into a compiled train
    step like every other optimizer here.
    """

    _NS_A, _NS_B, _NS_C = 3.4445, -4.7750, 2.0315

    def __init__(self, parameters, lr: float = 0.02, momentum: float = 0.95,
                 nesterov: bool = True, ns_steps: int = 5,
                 adamw_lr: float = 3e-4, beta1: float = 0.9,
                 beta2: float = 0.95, eps: float = 1e-8,
                 weight_decay: float = 0.0):
        super().__init__(parameters)
        self.lr, self.momentum, self.nesterov = lr, momentum, nesterov
        self.ns_steps, self.wd = ns_steps, weight_decay
        self.adamw_lr, self.b1, self.b2, self.eps = adamw_lr, beta1, beta2, eps
        self.buf = [self._zeros_like(p) for p in self.parameters]
        # second moments only for the AdamW fallback (ndim < 2)
        self.v = [self._zeros_like(p) if p.ndim < 2 else None
                  for p in self.parameters]
        self.t = 0

    def _ns5(self, g, rows: int, cols: int):
        """Orthogonalize (rows, cols) matrix ``g``: X ~ U V^T of its SVD."""
        a, b, c = self._NS_A, self._NS_B, self._NS_C
        tall = rows > cols
        x = g.transpose(1, 0) if tall else g
        x = x * (((x * x).sum()) ** 0.5 + 1e-7) ** -1.0
        for _ in range(self.ns_steps):
            xxt = x @ x.transpose(1, 0)
            bmat = xxt * b + (xxt @ xxt) * c
            x = x * a + bmat @ x
        return x.transpose(1, 0) if tall else x

    def step(self):
        self.t += 1
        super().step()

    def compute_delta(self, grad, i):
        p = self.parameters[i]
        m = self.buf[i]
        with Gradients.no_grad():
            if p.ndim >= 2:
                m *= self.momentum
                m += grad
                g = grad + m * self.momentum if self.nesterov else m
                rows, cols = p.shape[0], p.numel() // p.shape[0]
                o = self._ns5(g.reshape(rows, cols) if p.ndim != 2 else g,
                              rows, cols)
                if p.ndim != 2:
                    o = o.reshape(*p.shape)
                scale = max(1.0, rows / cols) ** 0.5
                u = o * scale
                if self.wd:
                    u = u + p * self.wd
                return u * (-self.lr)
            # AdamW fallback for vectors/scalars
            v = self.v[i]
            m *= self.b1
            m += grad * (1.0 - self.b1)
            v *= self.b2
            v += grad * grad * (1.0 - self.b2)
            mhat = m * (1.0 / (1.0 - self.b1 ** self.t))
            vhat = v * (1.0 / (1.0 - self.b2 ** self.t))
            u = mhat * (vhat ** 0.5 + self.eps) ** -1.0
            if self.wd:
                u = u + p * self.wd
            return u * (-self.adamw_lr)


class EMA:
    """Exponential moving average of parameters (shadow weights).

    The standard eval-quality trick for diffusion/vision training (Ho et al.
    2020 use decay 0.9999): shadow ``s = decay*s + (1-decay)*p`` after every
    optimizer step.  State is tensor-resident (one in-place ``iadd`` per
    parameter), so ``update()`` fuses into a compiled train step exactly like
    optimizer state does -- zero extra dispatches, zero host traffic.

    ``average_parameters()`` context-swaps the shadow values into the live
    parameter tensors (eval/sampling with averaged weights) and restores the
    raw weights on exit.  The swap uses ``_set_data`` on the same tensor
    objects, so module code needs no rebinds.

    No counterpart in the reference (its optimizers are stateless beyond
    moments, /root/reference/lightgrad/optim.py).
    """

    def __init__(self, parameters, decay: float = 0.999):
        self.parameters = tuple(parameters)
        assert all(isinstance(p, AbstractTensor) for p in self.parameters)
        assert 0.0 < decay < 1.0, "EMA decay must be in (0, 1)"
        self.decay = decay
        with Gradients.no_grad():
            self.shadow = [p.copy(requires_grad=False)
                           for p in self.parameters]

    @Gradients.no_grad()
    def update(self):
        """Fold the current parameter values into the shadow average."""
        k = 1.0 - self.decay
        for s, p in zip(self.shadow, self.parameters):
            s += (p - s) * k

    def state_dict(self) -> dict:
        return {f"ema.{i}": s.numpy() for i, s in enumerate(self.shadow)}

    def load_state_dict(self, d: dict) -> None:
        for i, s in enumerate(self.shadow):
            v = d[f"ema.{i}"]
            s._set_data(type(s).from_numpy(
                np.asarray(v), requires_grad=False).data)

    def copy_to(self, parameters=None) -> None:
        """Overwrite ``parameters`` (default: the tracked ones) with the
        shadow values -- the one-way 'finalize for export' path."""
        ps = self.parameters if parameters is None else tuple(parameters)
        for s, p in zip(self.shadow, ps):
            p._set_data(s._raw_data())

    def average_parameters(self):
        """Context manager: parameters hold the EMA values inside the block,
        their live (raw) values are restored on exit."""
        return _EMASwap(self)


class _EMASwap:
    def __init__(self, ema):
        self.ema = ema

    def __enter__(self):
        self._raw = [p._raw_data() for p in self.ema.parameters]
        self.ema.copy_to()
        return self.ema

    def __exit__(self, *exc):
        for p, d in zip(self.ema.parameters, self._raw):
            p._set_data(d)
        return False


@Gradients.no_grad()
def clip_grad_norm(parameters, max_norm: float):
    """Scale all gradients so their global L2 norm is at most ``max_norm``.

    Pure tensor math (no host sync, no data-dependent python control flow):
    the scale ``min(1, max_norm / (norm + eps))`` is computed as a rank-0
    tensor and multiplied into every grad in place, so a whole train step
    using it stays compilable by ``lightgrad_tpu.jit``.  Returns the norm
    as a rank-0 tensor (call ``.item()`` outside compiled steps to log it).

    No counterpart in the reference (its optimizers consume raw grads,
    /root/reference/lightgrad/optim.py:10-15).
    """
    params = [p for p in parameters if p.grad is not None]
    assert params, "clip_grad_norm: no parameter has a gradient"
    total = None
    for p in params:
        sq = (p.grad * p.grad).sum()
        total = sq if total is None else total + sq
    norm = total ** 0.5
    # min(1, c/n) without control flow: mask = (n > c) in {0, 1}
    over = norm.gt(max_norm)
    scale = over * (max_norm / (norm + 1e-6)) + (1.0 - over)
    for p in params:
        g = p.grad
        g *= scale  # in-place imul on the live grad tensor
    return norm
