"""LoRA: low-rank adaptation for parameter-efficient fine-tuning.

LoRA (arXiv:2106.09685) freezes a pretrained weight W and learns a rank-r
update ``W + (alpha/r) * B @ A`` with ``A (r, in)`` noise-initialized and
``B (out, r)`` zero-initialized, so training starts at the pretrained
function.  No reference counterpart (the reference has no fine-tuning
surface at all); this is the standard workflow for adapting the model zoo
(BERT/GPT/LLaMA/Mistral/...) on a single chip.

TPU-first notes: the adapter path is two thin GEMMs fused by XLA into the
surrounding program; frozen base weights carry ``requires_grad=False``, so
the tape records no backward for them -- a compiled fine-tuning step
computes gradients ONLY for the adapter tensors (r*(in+out) values per
layer instead of in*out).  ``merge_lora`` folds the update back into the
base weight (one outer-product GEMM per layer) for zero-overhead serving
and HF-format export.

Typical use::

    model, cfg = Llama.from_pretrained(...)
    lora.apply_lora(model, rank=8, targets=("q_proj", "v_proj"))
    opt = Adam(lora.lora_parameters(model), lr=1e-4)
    ... train ...
    lora.merge_lora(model)        # back to plain Linears, weights updated
"""

import numpy as np

from . import nn
from .autograd import no_grad

__all__ = ["LoRALinear", "apply_lora", "lora_parameters", "merge_lora",
           "lora_state_dict", "mark_only_lora_trainable"]


class LoRALinear(nn.Module):
    """A frozen ``nn.Linear`` plus a trainable rank-``r`` bypass.

    ``forward(x) = base(x) + dropout(x) @ A.T @ B.T * (alpha/r)``.
    The base layer's parameters are frozen on wrap (requires_grad=False);
    ``unwrap()`` returns the base with the update merged in-place.
    """

    def __init__(self, base: nn.Linear, rank: int, alpha: float = None,
                 dropout: float = 0.0):
        super().__init__()
        out_f, in_f = base.weight.shape
        self.base = base
        self.rank = int(rank)
        self.alpha = float(alpha if alpha is not None else rank)
        self.scaling = self.alpha / self.rank
        self.dropout = float(dropout)
        for p in base.parameters():
            p._set_requires_grad(False)
        # Kaiming-style A, zero B: the adapter starts as the identity delta
        bound = 1.0 / float(np.sqrt(in_f))
        self.lora_A = type(base.weight).uniform(
            -bound, bound, (self.rank, in_f))
        self.lora_B = type(base.weight).zeros((out_f, self.rank))

    def forward(self, x):
        y = self.base(x)
        h = x
        if self.dropout and self.training:
            h = h.dropout(p=self.dropout, training=True)
        delta = (h @ self.lora_A.T(1, 0)) @ self.lora_B.T(1, 0)
        if self.scaling != 1.0:
            delta = delta * self.scaling
        return y + delta

    def unwrap(self) -> nn.Linear:
        """Merge ``scaling * B @ A`` into the base weight (in place) and
        return the re-thawed base Linear."""
        with no_grad():
            delta = (self.lora_B @ self.lora_A) * self.scaling
            w = self.base.weight
            merged = w.detach() + delta.astype(w.dtype) \
                if hasattr(delta, "astype") else w.detach() + delta
            w._set_data(merged.data)
        for p in self.base.parameters():
            p._set_requires_grad(True)
        return self.base


def _walk_linears(module: nn.Module, prefix=""):
    for name, sub in list(module._modules.items()):
        full = f"{prefix}.{name}" if prefix else name
        if isinstance(sub, nn.Linear) and not isinstance(sub, LoRALinear):
            yield module, name, full, sub
        else:
            yield from _walk_linears(sub, full)


def apply_lora(model: nn.Module, rank: int = 8, alpha: float = None,
               targets=("q_proj", "v_proj"), dropout: float = 0.0,
               freeze_rest: bool = True):
    """Wrap every ``nn.Linear`` whose attribute name is in ``targets`` with
    a :class:`LoRALinear`; optionally freeze every other parameter.

    Returns the list of wrapped parameter paths.  Must run BEFORE any
    compiled-step capture (rebinding invalidates captures automatically)
    and is not supported inside a ``ScannedStack`` (scan_layers=True models
    stack per-layer weights into one tensor; fine-tune those with
    scan_layers=False).
    """
    targets = set(targets) if targets is not None else None
    wrapped = []
    for parent, name, full, lin in _walk_linears(model):
        if targets is not None and name not in targets:
            continue
        setattr(parent, name, LoRALinear(lin, rank, alpha, dropout))
        wrapped.append(full)
    if not wrapped:
        raise ValueError(f"no Linear matched targets {sorted(targets or ())}")
    if freeze_rest:
        mark_only_lora_trainable(model)
    return wrapped


def mark_only_lora_trainable(model: nn.Module):
    """Freeze every parameter except lora_A/lora_B (embedding tables, norms,
    biases included -- the strict LoRA recipe)."""
    for name, p in model.named_parameters():
        leaf = name.rsplit(".", 1)[-1]
        p._set_requires_grad(leaf in ("lora_A", "lora_B"))
    return model


def lora_parameters(model: nn.Module):
    """The trainable adapter tensors (pass to the optimizer)."""
    return [p for n, p in model.named_parameters()
            if n.rsplit(".", 1)[-1] in ("lora_A", "lora_B")]


def lora_state_dict(model: nn.Module) -> dict:
    """Adapter-only checkpoint (pairs with ``load_parameters`` on a model
    that already has the same ``apply_lora`` layout)."""
    return {n: p.numpy() for n, p in model.named_parameters()
            if n.rsplit(".", 1)[-1] in ("lora_A", "lora_B")}


def merge_lora(model: nn.Module):
    """Fold every adapter into its base weight and restore plain Linears
    (and re-thaw all parameters).  Returns the merged layer paths."""
    merged = []

    def _walk(module, prefix=""):
        for name, sub in list(module._modules.items()):
            full = f"{prefix}.{name}" if prefix else name
            if isinstance(sub, LoRALinear):
                setattr(module, name, sub.unwrap())
                merged.append(full)
            else:
                _walk(sub, full)

    _walk(model)
    for p in model.parameters():
        p._set_requires_grad(True)
    return merged
