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
        # log-sum-exp form: loss = lse(y) - y[label].  The forward never
        # materializes the (n, k) probabilities (the previous softmax form
        # wrote them, stashed them for backward, and re-read + copied them
        # there -- at GPT-2 scale that is ~4 extra full passes over a
        # 412 MB logits-sized buffer; measured 8.7 ms of a 21.9 ms
        # head+loss region).  Backward recomputes probs from the saved
        # logits FUSED into its single output pass.  Reductions/log run in
        # f32 regardless of the compute dtype (bf16 log(prob) loses ~3
        # significant bits; the upcast fuses into the reduce, nothing f32
        # ever hits HBM).
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
        m = y.max(axis=-1, keepdims=True)
        lse = (y - m).astype(np.float32).exp().sum(axis=-1).log() \
            + m.reshape(n).astype(np.float32)
        picked = y[np.arange(n), labels].astype(np.float32)
        nll = lse - picked
        if eps:
            # (1-eps)*nll + eps*mean_j(lse - y_j)  == the smoothed target
            nll = nll * (1.0 - eps) \
                + (lse - y.mean(axis=-1).astype(np.float32)) * eps
        if valid is not None:
            total = (nll * valid).sum() / denom
        else:
            total = nll.mean()
        ctx.save_for_backward(y, labels, lse, n, k, eps, valid, denom)
        return total

    def backward(ctx, out_grad):
        y, labels, lse, n, k, eps, valid, denom = ctx.get_saved_tensors()
        # d/dlogits = probs - ((1-eps) onehot + eps/K), masked + normalized.
        # probs recomputed as exp(y - lse); the onehot is a broadcast
        # equality (no scatter, no copy), so the whole backward is one
        # fused elementwise pass ending in a cast back to y's dtype.
        ar = type(y).from_numpy(np.arange(k, dtype=np.int32),
                                requires_grad=False)
        oh = labels.reshape(n, 1).eq(ar).astype(np.float32)
        g = (y.astype(np.float32) - lse.reshape(n, 1)).exp()
        if eps:
            g = g - oh * (1.0 - eps) - eps / k
        else:
            g = g - oh
        if valid is not None:
            g = g * (valid.reshape(n, 1) / denom)
        else:
            g = g * (1.0 / n)
        return (g * out_grad).astype(y.dtype)
