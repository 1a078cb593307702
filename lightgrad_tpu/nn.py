"""Module system and layers.

API parity with ``/root/reference/lightgrad/nn.py`` (Module / ModuleList /
Linear / Conv2d / LayerNorm) plus an ``Embedding`` layer -- the reference had
none and worked around it with a device->host->device gather hack
(reference examples/bert.py:19-21); our backends support native gather so the
layer is first-class.  ``state_dict`` adds the save path the reference lacked
(load-only checkpointing, SURVEY.md §5).
"""

import numpy as np

from .autograd import Tensor, AbstractTensor

__all__ = ["Module", "ModuleList", "Sequential", "Linear", "Conv2d",
           "ConvTranspose2d", "BatchNorm2d", "LayerNorm", "Embedding",
           "Dropout", "MoE", "ReLU", "GELU", "Tanh", "Flatten",
           "GroupNorm", "MaxPool2d", "AvgPool2d"]


def _match_placement(new_data, old_data):
    """Re-place loaded buffers onto the destination's device sharding.

    ``load_parameters`` builds replacement buffers on the default device; a
    parameter that was sharded over a mesh (``parallel.shard_module``) must
    not silently collapse to single-device placement on checkpoint resume --
    the next compiled step would either recompile for the new layout or
    reshard every step.  No-op for host (numpy) backends and for already-
    matching placements."""
    sharding = getattr(old_data, "sharding", None)
    if sharding is None or getattr(new_data, "sharding", None) == sharding:
        return new_data
    import jax

    return jax.device_put(new_data, sharding)


def _fan_in_uniform(shape, fan_in):
    """Layer-default initializer: ``U(-1/sqrt(fan_in), +1/sqrt(fan_in))``.

    The reference initializes every layer with ``Tensor.xavier`` =
    ``U(-1,1)/sqrt(numel)`` (reference tensor.py:86-89), which shrinks with
    the TOTAL element count -- for a (16,8,3,3) conv that is 5.7x smaller
    than the proper fan-in scale and measurably stalls CNN training (round-2
    smoke: 0.17 accuracy after 57 steps).  ``Tensor.xavier`` is kept for API
    parity; the layers themselves use fan-in scaling (torch's default)."""
    bound = 1.0 / float(np.sqrt(fan_in))
    return Tensor.uniform(-bound, bound, shape)


class Module:
    def __init__(self):
        object.__setattr__(self, "_params", {})
        object.__setattr__(self, "_modules", {})
        object.__setattr__(self, "_buffers", {})
        object.__setattr__(self, "training", True)

    def register_buffer(self, name: str, tensor):
        """Non-parameter persistent state (e.g. BatchNorm running stats):
        saved in state_dict / loaded by load_parameters, but never yielded
        by parameters(), so optimizers don't touch it."""
        self._buffers[name] = tensor
        object.__setattr__(self, name, tensor)
        return tensor

    def named_buffers(self, prefix: str = "", separator: str = "."):
        pfx = (prefix + separator) if prefix else ""
        for name, b in self._buffers.items():
            yield pfx + name, b
        for name, m in self._modules.items():
            yield from m.named_buffers(prefix=pfx + name, separator=separator)

    def forward(self, *args, **kwargs):
        raise NotImplementedError()

    def train(self, mode: bool = True):
        """Set training mode recursively (affects Dropout etc.)."""
        object.__setattr__(self, "training", mode)
        for m in self._modules.values():
            m.train(mode)
        return self

    def eval(self):
        return self.train(False)

    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)

    def __setattr__(self, name, val):
        if isinstance(val, (AbstractTensor, Module)):
            self.register_param_or_module(name, val)
        object.__setattr__(self, name, val)

    def register_param_or_module(self, name, val):
        if name in self._params or name in self._modules:
            # rebinding an existing parameter/submodule swaps the OBJECT a
            # compiled step captured by identity -- invalidate those programs
            # so they re-record instead of silently training the old tensor
            from .jit import invalidate_captures

            invalidate_captures()
        if isinstance(val, AbstractTensor):
            self._modules.pop(name, None)
            self._params[name] = val
        elif isinstance(val, Module):
            self._params.pop(name, None)
            self._modules[name] = val
        return val

    def unregister_param_or_module(self, name):
        return self._params.pop(name, None) or self._modules.pop(name, None)

    def parameters(self):
        yield from self._params.values()
        for m in self._modules.values():
            yield from m.parameters()

    def named_parameters(self, prefix: str = "", separator: str = "."):
        prefix = (prefix + separator) if prefix else ""
        for name, p in self._params.items():
            yield prefix + name, p
        for name, m in self._modules.items():
            yield from m.named_parameters(prefix=prefix + name, separator=separator)

    def zero_grad(self):
        """Zero every parameter's gradient (torch contract; equivalent to
        ``Optimizer.zero_grad`` for the module's own parameters — useful in
        gradient-accumulation loops that step less often than they
        backward)."""
        for p in self.parameters():
            p.zero_grad()
        return self

    def map_parameters(self, fn):
        """Apply ``fn`` to every parameter (e.g. ``lambda p: p.tpu()``)."""
        for key, p in list(self._params.items()):
            self.__setattr__(key, fn(p))
        for m in self._modules.values():
            m.map_parameters(fn)
        return self

    def load_parameters(self, param_dict: dict, prefix: str = "", separator: str = ".") -> None:
        param_dict = dict(param_dict)
        if prefix:
            prefix += separator
        for key, p in self._params.items():
            full = prefix + key
            assert full in param_dict, f"{full} not found in param dict"
            new_p = param_dict[full]
            if not isinstance(new_p, type(p)):
                if isinstance(new_p, AbstractTensor):
                    new_p = new_p.numpy()
                assert isinstance(new_p, np.ndarray), f"unexpected parameter type {type(new_p).__name__}"
                new_p = type(p).from_numpy(new_p)
            assert p.shape == new_p.shape, f"shape mismatch for {full}: {p.shape} != {new_p.shape}"
            # swap the buffer IN PLACE: optimizers (and any other holder of
            # this tensor object) keep observing the loaded values -- the
            # reference replaced the object, silently orphaning optimizer
            # references on checkpoint resume.  Preserve the DESTINATION
            # dtype: resuming into a bf16-cast model must not silently
            # upcast parameters to f32 (from_numpy's float default).
            new_data = new_p.data
            if new_data.dtype != p.data.dtype:
                new_data = new_data.astype(p.data.dtype)
            p._set_data(_match_placement(new_data, p.data))
        for key, b in self._buffers.items():
            # buffers load when present (running stats etc.); absent entries
            # keep their initialization -- torch checkpoints may omit e.g.
            # num_batches_tracked equivalents
            full = prefix + key
            if full in param_dict:
                v = param_dict[full]
                if isinstance(v, AbstractTensor):
                    v = v.numpy()
                new = type(b).from_numpy(np.asarray(v))
                assert b.shape == new.shape, \
                    f"shape mismatch for buffer {full}: {b.shape} != {new.shape}"
                data = new.data
                if data.dtype != b.data.dtype:
                    data = data.astype(b.data.dtype)
                b._set_data(_match_placement(data, b.data))
        for key, m in self._modules.items():
            m.load_parameters(param_dict, prefix=prefix + key, separator=separator)

    def state_dict(self, prefix: str = "", separator: str = ".") -> dict:
        """name -> np.ndarray snapshot (the save path the reference lacked).

        Recurses through submodules (rather than flat-walking
        ``named_parameters``) so modules with a virtual parameter layout --
        e.g. ``ScannedStack``, which stores L layers as stacked tensors but
        checkpoints them under per-layer names -- can override it."""
        pfx = (prefix + separator) if prefix else ""
        out = {pfx + n: p.numpy() for n, p in self._params.items()}
        out.update({pfx + n: b.numpy() for n, b in self._buffers.items()})
        for name, m in self._modules.items():
            out.update(m.state_dict(prefix=pfx + name, separator=separator))
        return out


class ModuleList(Module, list):
    def __init__(self, *elements):
        Module.__init__(self)
        list.__init__(self, elements)
        for i, e in enumerate(elements):
            self.register_param_or_module(str(i), e)

    def __setitem__(self, i, e):
        assert i < len(self)
        self.unregister_param_or_module(str(i))
        self.register_param_or_module(str(i), e)
        return list.__setitem__(self, i, e)

    def append(self, e):
        self.register_param_or_module(str(len(self)), e)
        return list.append(self, e)


class Sequential(ModuleList):
    """Chain of modules applied in order (torch-style convenience; the
    reference has no container modules at all -- its models wire layers by
    hand, reference nn.py)."""

    def forward(self, x):
        for m in self:
            x = m(x)
        return x


class ReLU(Module):
    def forward(self, x):
        return x.relu()


class GELU(Module):
    def forward(self, x):
        return x.gelu()


class Tanh(Module):
    def forward(self, x):
        return x.tanh()


class Flatten(Module):
    """Collapse all non-batch axes (the usual conv->linear bridge)."""

    def forward(self, x):
        return x.reshape(x.shape[0], -1)


def _amp_input(x, w):
    """Autocast boundary: a low-precision (AMP-cast) layer fed an f32
    input computes in the WEIGHT's dtype.  Without this, a mixed matmul
    silently promotes the whole op to f32 (an AMP leak that costs the
    one-pass MXU mode) and a mixed conv is a hard XLA error
    (lax.conv_general_dilated requires equal dtypes -- measured r5:
    ResNet-20 AMP train on raw f32 images).  The cast is on the tape, so
    the input's gradient flows back in f32 (the standard AMP boundary)."""
    import numpy as np
    wd, xd = np.dtype(w.dtype), np.dtype(x.dtype)
    if wd != xd and wd.itemsize < xd.itemsize and xd.kind == "f":
        return x.astype(w.dtype)
    return x


class Linear(Module):
    def __init__(self, in_feats: int, out_feats: int, bias: bool = True):
        super().__init__()
        self.weight = _fan_in_uniform((out_feats, in_feats), in_feats)
        self.bias = _fan_in_uniform((out_feats,), in_feats) if bias else None

    def forward(self, x):
        y = _amp_input(x, self.weight) @ self.weight.T(1, 0)
        return y + self.bias if self.bias is not None else y


class Conv2d(Module):
    """2-D convolution.  ``pad`` accepts an int (symmetric), a ``(lo, hi)``
    pair (asymmetric), or the strings ``"same"`` (stride-1 output size ==
    input size, correct for even kernels too) / ``"valid"`` (no padding).
    ``dilation`` spaces the kernel taps; ``groups`` splits channels into
    independent convolutions (``in_channels`` and ``out_channels`` must both
    be divisible by it)."""

    def __init__(self, in_channels: int, out_channels: int, kernelsize: int = 3,
                 stride: int = 1, pad=None, bias: bool = True,
                 dilation: int = 1, groups: int = 1):
        super().__init__()
        assert in_channels % groups == 0 and out_channels % groups == 0, \
            f"groups={groups} must divide channels ({in_channels}, {out_channels})"
        fan_in = (in_channels // groups) * kernelsize * kernelsize
        self.w = _fan_in_uniform(
            (out_channels, in_channels // groups, kernelsize, kernelsize), fan_in)
        self.b = _fan_in_uniform((1, out_channels, 1, 1), fan_in) if bias else None
        self.s, self.d, self.g = stride, dilation, groups
        k_eff = (kernelsize - 1) * dilation + 1
        if pad is None:
            pad = k_eff // 2
        if pad == "same":
            pad = ((k_eff - 1) // 2, k_eff // 2)
        elif pad == "valid":
            pad = 0
        assert isinstance(pad, (int, tuple)), f"bad pad spec {pad!r}"
        self.p = pad

    def forward(self, x):
        x = _amp_input(x, self.w)
        needs_pad = self.p != 0 and self.p != (0, 0)
        y = (x.pad(self.p) if needs_pad else x).conv(
            self.w, strides=self.s, dilation=self.d, groups=self.g)
        return y + self.b if self.b is not None else y


class ConvTranspose2d(Module):
    """2-D transposed convolution (decoder/upsampling architectures).

    Torch weight layout ``(in_channels, out_channels/groups, k, k)`` and
    output-size semantics; built on the ``conv_transpose`` composite
    (autograd/ops.py), so it runs and differentiates on every backend.  The
    reference has no transposed conv (its conv is forward-only on OpenCL,
    reference opencl/ops.py:403-408)."""

    def __init__(self, in_channels: int, out_channels: int, kernelsize: int = 3,
                 stride: int = 1, pad: int = 0, output_padding: int = 0,
                 bias: bool = True, dilation: int = 1, groups: int = 1):
        super().__init__()
        assert in_channels % groups == 0 and out_channels % groups == 0
        fan_in = (in_channels // groups) * kernelsize * kernelsize
        self.w = _fan_in_uniform(
            (in_channels, out_channels // groups, kernelsize, kernelsize),
            fan_in)
        self.b = _fan_in_uniform((1, out_channels, 1, 1), fan_in) if bias else None
        self.s, self.p, self.op = stride, pad, output_padding
        self.d, self.g = dilation, groups

    def forward(self, x):
        y = _amp_input(x, self.w).conv_transpose(
            self.w, strides=self.s, dilation=self.d, groups=self.g,
            output_padding=self.op, pad=self.p)
        return y + self.b if self.b is not None else y


class BatchNorm2d(Module):
    """Batch normalization over (B, C, H, W) with running statistics.

    Running mean/var live as buffers (register_buffer): checkpointed, never
    optimized.  Stat updates are true in-place tensor ops under no_grad, so
    a light.jit-compiled training step records them as buffer writes and the
    compiled program keeps updating them.  The reference has no normalization
    layer beyond LayerNorm (reference nn.py:109-124); BatchNorm is the
    missing piece for conv/vision families (ResNet)."""

    def __init__(self, num_features: int, eps: float = 1e-5,
                 momentum: float = 0.1, affine: bool = True):
        super().__init__()
        self.c = num_features
        self.eps, self.momentum = eps, momentum
        if affine:
            self.weight = Tensor.ones((num_features,))
            self.bias = Tensor.zeros((num_features,))
        else:
            self.weight = self.bias = None
        self.register_buffer("running_mean",
                             Tensor.zeros((num_features,), requires_grad=False))
        self.register_buffer("running_var",
                             Tensor.ones((num_features,), requires_grad=False))

    def forward(self, x):
        assert len(x.shape) == 4 and x.shape[1] == self.c, x.shape
        c = self.c
        if self.training:
            m = x.mean(axis=(0, 2, 3))
            d = x - m.reshape(1, c, 1, 1)
            v = (d * d).mean(axis=(0, 2, 3))
            n = x.shape[0] * x.shape[2] * x.shape[3]
            from .autograd import no_grad

            with no_grad():
                mom = self.momentum
                self.running_mean *= (1.0 - mom)
                self.running_mean += m.detach() * mom
                self.running_var *= (1.0 - mom)
                # torch tracks the UNBIASED variance in running stats
                self.running_var += v.detach() * (mom * n / max(n - 1, 1))
            xh = d / (v.reshape(1, c, 1, 1) + self.eps).pow(0.5)
        else:
            m = self.running_mean.reshape(1, c, 1, 1)
            v = self.running_var.reshape(1, c, 1, 1)
            xh = (x - m) / (v + self.eps).pow(0.5)
        if self.weight is not None:
            xh = xh * self.weight.reshape(1, c, 1, 1) + self.bias.reshape(1, c, 1, 1)
        return xh


class LayerNorm(Module):
    def __init__(self, shape, eps: float = 1e-5):
        super().__init__()
        self.shape = tuple(shape) if isinstance(shape, (tuple, list)) else (shape,)
        self.eps = eps
        self.weight = Tensor.ones(self.shape)
        self.bias = Tensor.zeros(self.shape)

    def forward(self, x):
        assert x.shape[-len(self.shape):] == self.shape, (
            f"LayerNorm shape mismatch: {x.shape} vs {self.shape}"
        )
        if hasattr(x, "layernorm"):
            # fused pallas kernel (TPU backend)
            return x.layernorm(self.weight, self.bias, eps=self.eps)
        axes = tuple(range(len(x.shape) - len(self.shape), len(x.shape)))
        d = x - x.mean(axis=axes, keepdims=True)
        v = (d * d).mean(axis=axes, keepdims=True)
        return d / (v + self.eps).pow(0.5) * self.weight + self.bias


class Embedding(Module):
    """Token-id -> vector gather (no CPU round-trip, unlike reference bert.py:21)."""

    def __init__(self, num_embeddings: int, embedding_dim: int):
        super().__init__()
        self.weight = Tensor.xavier((num_embeddings, embedding_dim))

    def forward(self, ids):
        return self.weight[ids]


class GroupNorm(Module):
    """Group normalization (https://arxiv.org/abs/1803.08494): normalize
    over (C/groups, *spatial) per group, per-channel affine.  Batch-size
    independent (no running stats), so unlike BatchNorm it behaves the same
    under data-parallel sharding and at batch 1.  torch-parity tested."""

    def __init__(self, num_groups: int, num_channels: int, eps: float = 1e-5,
                 affine: bool = True):
        super().__init__()
        assert num_channels % num_groups == 0, (num_groups, num_channels)
        self.groups, self.channels, self.eps = num_groups, num_channels, eps
        if affine:
            self.weight = Tensor.ones((num_channels,))
            self.bias = Tensor.zeros((num_channels,))

    def forward(self, x):
        n, c = x.shape[0], x.shape[1]
        assert c == self.channels, (c, self.channels)
        xs = x.reshape(n, self.groups, -1)
        mu = xs.mean(axis=-1, keepdims=True)
        d = xs - mu
        var = (d * d).mean(axis=-1, keepdims=True)
        xn = (d * (var + self.eps) ** -0.5).reshape(*x.shape)
        if not hasattr(self, "weight"):
            return xn
        shape = (1, c) + (1,) * (len(x.shape) - 2)
        return xn * self.weight.reshape(*shape) + self.bias.reshape(*shape)


class MaxPool2d(Module):
    """Module wrapper over the ``max_pool2d`` op (torch semantics:
    stride defaults to kernel, int padding pads with -inf)."""

    def __init__(self, kernel: int = 2, stride: int = None, padding: int = 0):
        super().__init__()
        self.kernel = (kernel, kernel) if isinstance(kernel, int) else kernel
        self.stride, self.padding = stride, padding

    def forward(self, x):
        return x.max_pool2d(kernel=self.kernel, stride=self.stride,
                            padding=self.padding)


class AvgPool2d(Module):
    """Module wrapper over ``mean_pool`` (non-overlapping windows:
    stride == kernel)."""

    def __init__(self, kernel: int = 2):
        super().__init__()
        self.kernel = (kernel, kernel) if isinstance(kernel, int) else kernel

    def forward(self, x):
        return x.mean_pool(kernel=self.kernel)


class Dropout(Module):
    """Inverted dropout; identity in eval mode (`module.eval()`)."""

    def __init__(self, p: float = 0.5):
        super().__init__()
        self.p = p

    def forward(self, x):
        return x.dropout(p=self.p, training=self.training)


class MoE(Module):
    """Mixture-of-experts FFN.

    Stacked expert weights `(E, d, h)` shard cleanly over an `ep` mesh axis
    (lightgrad_tpu.parallel.MOE_EP_RULES), giving expert-parallel compute and
    memory.  Two dispatch modes:

    * ``dispatch="dense"`` (Soft-MoE style): every expert processes every
      token, the router softmax weights the mixture.
    * ``dispatch="top1"`` / ``dispatch="topk"`` (Switch / GShard style): each
      token routes to its top-1 (or top-``k``) experts, subject to per-expert
      capacity ``ceil(k*T/E * capacity_factor)``; over-capacity routings are
      dropped (their output is zero -- the usual residual connection carries
      them).  Built entirely from one-hot matmuls and a device ``cumsum``
      (O(T) memory -- no host-built (T,T) triangular matrix), so the tape
      differentiates the selected gates and expert paths and the MXU does
      the dispatch.  Argmax ties break deterministically to the lowest
      expert index.
    """

    def __init__(self, dim: int, hidden: int, n_experts: int,
                 dispatch: str = "dense", capacity_factor: float = 1.25,
                 k: int = 2, normalize_gates: bool = True,
                 n_shared: int = 0, ffn: str = "gelu"):
        super().__init__()
        assert dispatch in ("dense", "top1", "topk"), dispatch
        assert ffn in ("gelu", "swiglu"), ffn
        self.n_experts = n_experts
        self.dispatch = dispatch
        self.capacity_factor = capacity_factor
        self.k = 1 if dispatch == "top1" else k
        assert 1 <= self.k <= n_experts, (self.k, n_experts)
        self.normalize_gates = normalize_gates
        self.router = Linear(dim, n_experts, bias=False)
        self.ffn = ffn
        self.w1 = _fan_in_uniform((n_experts, dim, hidden), dim)
        self.w2 = _fan_in_uniform((n_experts, hidden, dim), hidden)
        if ffn == "swiglu":
            # Mixtral-style experts: w2(silu(w1 x) * w3 x)
            self.w3 = _fan_in_uniform((n_experts, dim, hidden), dim)
        # DeepSeekMoE-style SHARED experts (arXiv:2401.06066): always-on
        # dense experts added to every token's routed output -- they absorb
        # common knowledge so the routed experts specialize.  Stacked like
        # the routed weights, but replicated (not ep-sharded): every device
        # needs them every token.
        self.n_shared = n_shared
        if n_shared:
            self.ws1 = _fan_in_uniform((n_shared, dim, hidden), dim)
            self.ws2 = _fan_in_uniform((n_shared, hidden, dim), hidden)

    def _shared(self, t, n_tok, dim):
        tb = t.reshape(1, n_tok, dim)
        return ((tb @ self.ws1).gelu() @ self.ws2).sum(axis=0)

    def _experts(self, xe):
        """Per-expert FFN on stacked input ``(E, n, d)`` -> ``(E, n, d)``."""
        if self.ffn == "swiglu":
            g = xe @ self.w1
            return (g.sigmoid() * g * (xe @ self.w3)) @ self.w2
        return (xe @ self.w1).gelu() @ self.w2

    def _dense(self, t, n_tok, dim):
        gates = self.router(t).softmax(axis=-1)      # (T, E)
        tb = t.reshape(1, n_tok, dim)                # broadcast over experts
        h = self._experts(tb)                        # (E, T, d)
        w = gates.T(1, 0).reshape(self.n_experts, n_tok, 1)
        return (h * w).sum(axis=0)                   # (T, d)

    @staticmethod
    def _argmax_onehot(scores):
        """First-match argmax one-hot along the last axis (no grad).

        ``eq(max)`` alone double-dispatches on exact ties (plausible at init
        or in bf16); masking all but the lowest tied index makes routing
        deterministic and keeps gates/capacity single-counted.
        """
        is_max = scores.eq(scores.max(axis=-1, keepdims=True))   # (T, E)
        earlier = is_max.cumsum(axis=-1) - is_max                # exclusive
        return is_max * (earlier * -1.0 + 1.0).gt(0.5)           # earlier == 0

    def _topk(self, t, n_tok, dim):
        import math

        n_exp, k = self.n_experts, self.k
        cap = max(1, math.ceil(k * n_tok / n_exp * self.capacity_factor))
        logits = self.router(t)                      # (T, E)
        probs = logits.softmax(axis=-1)

        # router z-loss (ST-MoE, arXiv:2202.08906): mean squared logsumexp
        # of the router logits -- keeps them small so the bf16 softmax stays
        # well-conditioned.  Stable lse via a detached rowwise max shift.
        m = logits.max(axis=-1, keepdims=True)
        lse = (logits - m).exp().sum(axis=-1, keepdims=True).log() + m
        object.__setattr__(self, "z_loss", (lse * lse).mean())

        # --- route: k argmax passes with deterministic tie-break ----------
        onehots, gates = [], []
        remaining = probs
        for _ in range(k):
            oh = self._argmax_onehot(remaining)
            onehots.append(oh)
            gates.append((probs * oh).sum(axis=-1, keepdims=True))
            if len(onehots) < k:
                remaining = remaining * (oh * -1.0 + 1.0)
        if self.normalize_gates and k > 1:
            denom = gates[0]
            for g in gates[1:]:
                denom = denom + g
            gates = [g / (denom + 1e-9) for g in gates]

        # Switch-Transformer load-balancing loss on the FIRST choice:
        # E * sum_e f_e * P_e, f_e = fraction of tokens whose top-1 is e
        # (no grad), P_e = mean router probability (grads flow).
        frac = onehots[0].mean(axis=0)               # (E,)
        mean_prob = probs.mean(axis=0)               # (E,)
        # plain attribute, NOT a registered parameter (it is a per-forward
        # activation, not trainable state)
        object.__setattr__(
            self, "aux_loss", (frac * mean_prob).sum() * float(n_exp)
        )

        # --- capacity: slot positions via device cumsum (O(T) memory) -----
        # Choice-major priority: all first choices claim slots before any
        # second choice; within a choice, token order.  ``filled`` carries
        # the per-expert count of already-kept slots between choices, so
        # slot indices are contiguous and collision-free.
        slots = type(t).from_numpy(
            np.arange(cap, dtype=np.float32), requires_grad=False
        ).reshape(1, cap)
        disp = None                                  # (T, E*C) 0/1
        comb = None                                  # (T, E*C) gate-weighted
        filled = None                                # (1, E) kept so far
        for oh, gate in zip(onehots, gates):
            pos = oh.cumsum(axis=0) - oh             # (T, E) exclusive
            if filled is not None:
                pos = pos + filled
            keep = oh * (pos * -1.0 + float(cap)).gt(0.5)        # pos < cap
            filled = keep.sum(axis=0, keepdims=True) if filled is None \
                else filled + keep.sum(axis=0, keepdims=True)
            pos_tok = (pos * keep).sum(axis=-1, keepdims=True)   # (T, 1)
            poh = pos_tok.eq(slots)                  # (T, C) slot one-hot
            d = (keep.reshape(n_tok, n_exp, 1) * poh.reshape(n_tok, 1, cap))
            d = d.reshape(n_tok, n_exp * cap)
            disp = d if disp is None else disp + d
            dg = d * gate
            comb = dg if comb is None else comb + dg

        # --- expert FFN + combine ------------------------------------------
        xd = disp.T(1, 0) @ t                        # (E*C, d)
        h = self._experts(xd.reshape(n_exp, cap, dim))
        return comb @ h.reshape(n_exp * cap, dim)

    def forward(self, x):
        lead, dim = x.shape[:-1], x.shape[-1]
        t = x.reshape(-1, dim)                       # (T, d)
        n_tok = t.shape[0]
        if self.dispatch in ("top1", "topk"):
            y = self._topk(t, n_tok, dim)
        else:
            y = self._dense(t, n_tok, dim)
        if self.n_shared:
            y = y + self._shared(t, n_tok, dim)
        return y.reshape(*lead, dim)
