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
    """Softmax cross-entropy against integer labels.

    ``ignore_index`` (torch semantics) drops rows whose label equals it
    (e.g. -100 padding in LM / seq2seq batches) and normalizes by the
    VALID-row count; at least one row must be valid.  ``label_smoothing``
    trains against ``(1-eps) * onehot + eps/K * uniform``.  Both are pure
    tensor math (no data-dependent Python control flow), so padded-batch
    steps stay compilable by ``lightgrad_tpu.jit``."""

    def forward(ctx, y, labels, axis: int = -1, ignore_index: int = None,
                label_smoothing: float = 0.0):
        probs = y.softmax(axis=axis)
        n = labels.shape[0]
        k = y.shape[-1]
        eps = float(label_smoothing)
        if ignore_index is not None:
            valid = labels.eq(ignore_index) * -1.0 + 1.0     # float {0,1}
            # ignored labels may be out of range (-100): gather row 0 instead
            labels = (labels * valid.astype(labels.dtype))
            denom = valid.sum()
        else:
            valid, denom = None, None
        picked = probs[np.arange(n), labels]
        nll = -(picked.log())
        if eps:
            nll = nll * (1.0 - eps) - probs.log().mean(axis=-1) * eps
        if valid is not None:
            total = (nll * valid).sum() / denom
        else:
            total = nll.mean()
        ctx.save_for_backward(probs, labels, n, k, eps, valid, denom)
        return total

    def backward(ctx, out_grad):
        probs, labels, n, k, eps, valid, denom = ctx.get_saved_tensors()
        # d/dlogits = probs - ((1-eps) onehot + eps/K), masked + normalized
        g = probs.copy(requires_grad=False)
        if eps:
            g -= eps / k
        g[np.arange(n), labels] -= 1.0 - eps
        if valid is not None:
            g *= valid.reshape(n, 1) / denom
        else:
            g *= 1.0 / n
        return g * out_grad
