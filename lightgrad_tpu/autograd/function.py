"""Tape nodes: the ``Function`` base class and the composite-op helper.

Public contract matches the reference's extension API
(``/root/reference/lightgrad/autograd/func.py`` and ``ReadMe.md``): an op is a
``Function`` subclass with ``forward(ctx, *args)`` / ``backward(ctx, out_grad)``
methods and ``ctx.save_for_backward(...)`` residual storage, registered onto a
tensor class via ``Tensor.register_op``.

Differences from the reference (deliberate, TPU-first):

* Composite ops (the reference's ``WrapperFunction`` sub-tape capture/replay,
  func.py:71-106) are replaced by :func:`composite` -- a plain Python function
  whose primitive ops record directly on the main tape.  The backward walk is a
  single topological traversal (see ``grads.py``), so no replay machinery is
  needed; profiler granularity is preserved by wrapping the composite call in a
  single ``Tracker``.
* A tape node is only attached when gradients are enabled *and* at least one
  parent requires a gradient, pruning dead subgraphs before they cost memory.
* Gradient un-broadcasting (summing over broadcast axes, reference
  func.py:49-56) stays in the core so backend ops return "natural" gradients.
"""

from .grads import Gradients
from ..utils.profiler import Tracker

__all__ = ["Function", "composite"]


def _unbroadcast(grad, shape):
    """Reduce ``grad`` back to ``shape`` by summing over broadcast axes."""
    if grad.shape == tuple(shape):
        return grad
    # sum out prepended axes
    extra = len(grad.shape) - len(shape)
    if extra > 0:
        grad = grad.sum(axis=tuple(range(extra)))
    # sum over axes the input held with size 1
    axes = tuple(i for i, s in enumerate(shape) if s == 1 and grad.shape[i] != 1)
    if axes:
        grad = grad.sum(axis=axes, keepdims=True)
    return grad


class _FunctionMeta(type):
    """Calling a Function subclass applies it: builds the tape node, runs
    ``forward`` under ``no_grad`` and attaches the node to the output."""

    def __call__(cls, *args, **kwargs):
        from .tensor import AbstractTensor

        # keyword arguments must be configuration, not differentiable inputs
        assert not any(
            isinstance(v, AbstractTensor) and v.requires_grad for v in kwargs.values()
        ), f"{cls.__name__}: tensors requiring grad must be positional arguments"

        f = object.__new__(cls)
        f.parents = tuple(a for a in args if isinstance(a, AbstractTensor))
        f.out = None
        f._saved = ()
        if f.parents:
            tensor_cls = type(f.parents[0])
            assert all(type(t) is tensor_cls for t in f.parents), (
                f"{cls.__name__}: all tensor operands must share one backend, got "
                f"{[type(t).__name__ for t in f.parents]}"
            )

        with Tracker(cls.__name__):
            with Gradients.no_grad():
                out = f.forward(*args, **kwargs)

        if any(out is t for t in f.parents):
            # in-place op returning one of its inputs: never rewire the tape
            assert not (Gradients._is_enabled() and out.requires_grad), (
                f"in-place {cls.__name__} on a tensor requiring grad is not "
                f"differentiable -- wrap the update in no_grad()"
            )
            return out
        if Gradients._is_enabled() and any(t.requires_grad for t in f.parents):
            out._set_ctx(f)
            out._set_requires_grad(True)
            f.out = out
        else:
            out._set_requires_grad(False)
        return out


class Function(metaclass=_FunctionMeta):
    """Base class of every primitive op / tape node.

    Subclasses implement ``forward(ctx, *args, **kwargs) -> Tensor`` and
    ``backward(ctx, out_grad) -> grad | tuple-of-grads`` (one per parent
    tensor, ``None`` allowed).  ``forward`` runs with gradients disabled.
    """

    @property
    def parent_tensors(self):
        return self.parents

    def save_for_backward(self, *items):
        self._saved = self._saved + items

    def get_saved_tensors(self):
        return self._saved

    def forward(ctx, *args, **kwargs):
        raise NotImplementedError()

    def backward(ctx, out_grad):
        raise NotImplementedError(
            f"{type(ctx).__name__} does not support backpropagation"
        )

    def _backpropagate(self, out_grad) -> None:
        with Tracker(type(self).__name__, backward=True):
            grads = self.backward(out_grad)
        grads = grads if isinstance(grads, tuple) else (grads,)
        # fewer grads than parents is allowed: trailing parents (e.g. loss
        # targets) receive no gradient
        assert len(grads) <= len(self.parents), (
            f"{type(self).__name__}.backward returned {len(grads)} gradients "
            f"for {len(self.parents)} inputs"
        )
        for t, g in zip(self.parents, grads):
            if g is None or not t.requires_grad:
                continue
            g = _unbroadcast(g, t.shape)
            assert g.shape == t.shape, (
                f"{type(self).__name__}: gradient shape {g.shape} does not "
                f"match input shape {t.shape}"
            )
            t.add_grad(g)


def composite(fn):
    """Wrap a device-agnostic derived op built from primitive tensor ops.

    The wrapped function runs with gradients *enabled*: its primitive sub-ops
    record directly on the global tape (the TPU-native replacement for the
    reference's WrapperFunction sub-tape replay).  The whole call is tracked as
    a single profiler entry; nested primitive trackers are suppressed.
    """

    def wrapper(*args, **kwargs):
        with Tracker(fn.__name__):
            return fn(*args, **kwargs)

    wrapper.__name__ = fn.__name__
    wrapper.__doc__ = fn.__doc__
    return wrapper
