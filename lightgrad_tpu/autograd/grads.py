"""Gradient bookkeeping: the grad-enabled state and the reverse-mode graph walk.

Capability parity with the reference's ``Gradients`` engine
(``/root/reference/lightgrad/autograd/grads.py``), re-designed for correctness:
the reference walks the tape with a LIFO ``OrderedDict`` worklist which can pop
a node before all of its consumers have contributed their gradient (the diamond
hazard called out in SURVEY.md §2.1 #5).  We instead compute a proper
reverse-topological order over the ``Function`` DAG once and process nodes in
that order, so every node sees its fully-accumulated output gradient exactly
once.  This also halves redundant kernel launches on re-converging graphs,
which matters on TPU where each backward op is a compiled XLA/Pallas call.
"""

from functools import wraps

__all__ = ["Gradients", "no_grad"]


class _NoGradHandler:
    """Context-manager *and* decorator that disables gradient tracking."""

    def __enter__(self):
        Gradients.disable()
        return self

    def __exit__(self, *exc):
        Gradients.enable()
        return False

    def __call__(self, fn):
        @wraps(fn)
        def wrapper(*args, **kwargs):
            with self:
                return fn(*args, **kwargs)

        return wrapper


class Gradients:
    """Global (nested) gradient-enable switch + the backward graph walk."""

    _disable_depth = 0

    @staticmethod
    def disable():
        Gradients._disable_depth += 1

    @staticmethod
    def enable():
        Gradients._disable_depth = max(0, Gradients._disable_depth - 1)

    @staticmethod
    def _is_enabled() -> bool:
        return Gradients._disable_depth == 0

    @staticmethod
    def no_grad() -> _NoGradHandler:
        return _NoGradHandler()

    @staticmethod
    def backward(ctx, grad) -> None:
        """Run reverse-mode accumulation starting from tape node ``ctx``.

        ``grad`` is the seed gradient of ``ctx``'s output tensor.  Interior
        gradients are read back from each node's output tensor, into which all
        of that tensor's consumers have already accumulated (guaranteed by the
        topological order).
        """
        if ctx is None:
            return
        # --- iterative DFS post-order over the Function DAG ----------------
        order = []
        seen = set()
        stack = [(ctx, False)]
        while stack:
            node, expanded = stack.pop()
            if expanded:
                order.append(node)
                continue
            if id(node) in seen:
                continue
            seen.add(id(node))
            stack.append((node, True))
            for t in node.parent_tensors:
                if t.requires_grad and t.ctx is not None:
                    stack.append((t.ctx, False))
        # --- process consumers-before-producers (reversed post-order) ------
        with Gradients.no_grad():
            for node in reversed(order):
                out_grad = grad if node is ctx else node.out.grad
                if out_grad is None:
                    # output unreachable from the seed (shared subgraph whose
                    # consumer lies outside this backward) -- nothing to do
                    continue
                node._backpropagate(out_grad)


no_grad = Gradients.no_grad
