"""Differential fuzzing: tape gradients vs jax.grad on random op trees.

The per-op gradcheck matrix (tests/test_cpu_tensor.py, test_tpu_tensor.py)
validates each op in isolation against finite differences; this file
validates *compositions*: random expression trees over the shape-preserving
op set are evaluated twice -- once through the autograd tape (TpuTensor) and
once as a pure-jax twin -- and both the forward value and every input
gradient must agree.  Catches cross-op bugs (broadcast/unbroadcast of
intermediate grads, accumulation on reused subtrees, view/copy aliasing)
that single-op checks structurally cannot.

No counterpart in the reference (its tests are the fixed gradcheck matrix,
/root/reference/test/).
"""

import numpy as np
import pytest

import jax.numpy as jnp
import jax

from lightgrad_tpu.autograd import TpuTensor

N = 5  # all tensors are (N, N): every op below is shape-preserving


def _softmax_j(a):
    z = a - a.max(-1, keepdims=True)
    e = jnp.exp(z)
    return e / e.sum(-1, keepdims=True)


# (name, arity, ours(t...), jax(a...)) -- shape-preserving on (N, N)
OPS = [
    ("neg", 1, lambda t: -t, lambda a: -a),
    ("relu", 1, lambda t: t.relu(), lambda a: jnp.maximum(a, 0)),
    ("sigmoid", 1, lambda t: t.sigmoid(), lambda a: jax.nn.sigmoid(a)),
    ("tanh", 1, lambda t: t.tanh(), lambda a: jnp.tanh(a)),
    ("exp", 1, lambda t: (t * 0.3).exp(), lambda a: jnp.exp(a * 0.3)),
    ("square", 1, lambda t: t * t, lambda a: a * a),
    ("transpose", 1, lambda t: t.T(1, 0), lambda a: a.T),
    ("softmax", 1, lambda t: t.softmax(axis=-1), _softmax_j),
    ("scale", 1, lambda t: t * 0.7 + 0.1, lambda a: a * 0.7 + 0.1),
    ("add", 2, lambda x, y: x + y, lambda a, b: a + b),
    ("sub", 2, lambda x, y: x - y, lambda a, b: a - b),
    ("mul", 2, lambda x, y: x * y, lambda a, b: a * b),
    ("matmul", 2, lambda x, y: (x @ y) * (1.0 / N), lambda a, b: (a @ b) / N),
]


def _gen_tree(rng, depth, n_leaves):
    """Random expression tree: leaves are input indices, nodes are OPS rows."""
    if depth == 0 or rng.random() < 0.25:
        return int(rng.integers(n_leaves))
    name, arity, f, g = OPS[int(rng.integers(len(OPS)))]
    return (name, tuple(_gen_tree(rng, depth - 1, n_leaves) for _ in range(arity)))


def _describe(tree):
    if isinstance(tree, int):
        return f"x{tree}"
    name, kids = tree
    return f"{name}({', '.join(_describe(k) for k in kids)})"


def _eval(tree, leaves, which):
    """which=2: ours (tape tensors); which=3: jax twin."""
    if isinstance(tree, int):
        return leaves[tree]
    name, kids = tree
    row = next(r for r in OPS if r[0] == name)
    return row[which](*(_eval(k, leaves, which) for k in kids))


@pytest.mark.parametrize("seed", range(8))
def test_random_composition_grads_match_jax(seed):
    rng = np.random.default_rng(seed)
    n_leaves = int(rng.integers(2, 4))
    tree = _gen_tree(rng, depth=4, n_leaves=n_leaves)
    inputs = [rng.uniform(-1, 1, (N, N)).astype(np.float32)
              for _ in range(n_leaves)]

    # ours: eager tape forward + backward
    ts = [TpuTensor.from_numpy(a.copy()) for a in inputs]
    out = _eval(tree, ts, 2)
    loss = (out * out).sum() * (1.0 / out.numel())
    loss.backward()

    # twin: pure jax with jax.grad
    def twin(args):
        y = _eval(tree, list(args), 3)
        return jnp.mean(y * y)

    val = twin([jnp.asarray(a) for a in inputs])
    grads = jax.grad(twin)([jnp.asarray(a) for a in inputs])

    desc = _describe(tree)
    np.testing.assert_allclose(float(loss.numpy()), float(val), rtol=1e-4,
                               atol=1e-5, err_msg=desc)
    for i, (t, g) in enumerate(zip(ts, grads)):
        got = t.grad.numpy() if t.grad is not None else np.zeros_like(inputs[i])
        np.testing.assert_allclose(got, np.asarray(g), rtol=2e-4, atol=2e-5,
                                   err_msg=f"grad x{i} of {desc}")


@pytest.mark.parametrize("seed", [101, 202])
def test_random_composition_with_reused_subtree(seed):
    """The same input appears on BOTH sides of a binary op (diamond graph):
    gradient accumulation across the reconvergent paths must match jax."""
    rng = np.random.default_rng(seed)
    x_np = rng.uniform(-1, 1, (N, N)).astype(np.float32)

    x = TpuTensor.from_numpy(x_np.copy())
    ours = (x.sigmoid() @ x.tanh() + x * x).softmax(axis=-1)
    loss = (ours * ours).sum()
    loss.backward()

    def twin(a):
        y = _softmax_j(jax.nn.sigmoid(a) @ jnp.tanh(a) + a * a)
        return jnp.sum(y * y)

    g = jax.grad(twin)(jnp.asarray(x_np))
    np.testing.assert_allclose(x.grad.numpy(), np.asarray(g), rtol=2e-4,
                               atol=2e-5)
