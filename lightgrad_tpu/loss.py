"""Losses: MSE and cross-entropy.

API parity with ``/root/reference/lightgrad/loss.py``.  Unlike the reference,
``cross_entropy`` works on every backend: it needs advanced integer indexing
(``y[range(n), labels]``), which the TPU backend supports natively (the
reference could only run it on CPU, SURVEY.md §2.1 #19).
"""

import numpy as np

from .autograd import Function

__all__ = ["mse", "cross_entropy"]


class mse(Function):
    """Mean squared error: ``mean((y - y_hat)^2) / 2`` with analytic backward."""

    def forward(ctx, y, y_hat):
        err = y - y_hat
        ctx.save_for_backward(err)
        return (err ** 2.0).mean() * 0.5

    def backward(ctx, out_grad):
        (err,) = ctx.get_saved_tensors()
        return err * out_grad * (1.0 / err.numel())


class cross_entropy(Function):
    """Softmax cross-entropy against integer labels."""

    def forward(ctx, y, labels, axis: int = -1):
        probs = y.softmax(axis=axis)
        n = labels.shape[0]
        picked = probs[np.arange(n), labels]
        ctx.save_for_backward(probs, labels, n)
        return -(picked.log().mean())

    def backward(ctx, out_grad):
        probs, labels, n = ctx.get_saved_tensors()
        g = probs.copy(requires_grad=False)
        g[np.arange(n), labels] -= 1.0
        g *= 1.0 / n
        return g * out_grad
