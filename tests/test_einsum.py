"""einsum op: value + gradients vs numpy/jax twins on both backends.

Covers contraction (matmul), reduction with broadcast-back gradients,
elementwise product, batched contraction, matvec, transposed layouts,
scalar output, frozen operands, and the asserted grammar restrictions.
No reference counterpart (/root/reference has no einsum).
"""

import numpy as np
import pytest

import lightgrad_tpu as light
from lightgrad_tpu.autograd import CpuTensor, TpuTensor

np.random.seed(11)

SPECS = [
    ("ab,bc->ac", [(4, 5), (5, 3)]),          # matmul
    ("ab->b", [(4, 5)]),                      # reduction (grad broadcasts back)
    ("ab->", [(3, 4)]),                       # full sum, scalar out
    ("ab,ab->ab", [(4, 5), (4, 5)]),          # elementwise
    ("bij,bjk->bik", [(2, 3, 4), (2, 4, 5)]), # batched matmul
    ("ab,b->a", [(4, 5), (5,)]),              # matvec
    ("ab,cb->ac", [(4, 5), (3, 5)]),          # transposed operand
    ("abc,dc->abd", [(2, 3, 4), (5, 4)]),     # projection over trailing dim
    ("a,b->ab", [(3,), (4,)]),                # outer product
    ("ab,b->b", [(3, 4), (4,)]),              # reduce one operand only
]


def _np_grads(spec, arrs):
    """Finite-difference-free oracle: jax.grad on the same spec."""
    import jax
    import jax.numpy as jnp

    def f(args):
        y = jnp.einsum(spec, *args)
        return jnp.sum(y * jnp.cos(y))  # nonlinear head so grads aren't constant

    val = f([jnp.asarray(a) for a in arrs])
    grads = jax.grad(f)([jnp.asarray(a) for a in arrs])
    return float(val), [np.asarray(g) for g in grads]


@pytest.mark.parametrize("backend", [CpuTensor, TpuTensor])
@pytest.mark.parametrize("spec,shapes", SPECS)
def test_einsum_value_and_grads(backend, spec, shapes):
    arrs = [np.random.uniform(-1, 1, s).astype(np.float32) for s in shapes]
    ts = [backend.from_numpy(a.copy()) for a in arrs]

    y = ts[0].einsum(spec, *ts[1:])
    ref_val, ref_grads = _np_grads(spec, arrs)

    loss = (y * y.cos()).sum()
    np.testing.assert_allclose(float(loss.numpy()), ref_val, rtol=1e-4, atol=1e-5)
    loss.backward()
    for t, g in zip(ts, ref_grads):
        np.testing.assert_allclose(t.grad.numpy(), g, rtol=2e-4, atol=2e-5,
                                   err_msg=spec)


def test_einsum_top_level_helper():
    a = TpuTensor.from_numpy(np.random.uniform(-1, 1, (3, 4)).astype(np.float32))
    b = TpuTensor.from_numpy(np.random.uniform(-1, 1, (4, 2)).astype(np.float32))
    y = light.einsum("ab,bc->ac", a, b)
    np.testing.assert_allclose(y.numpy(), a.numpy() @ b.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_einsum_frozen_operand_gets_no_grad():
    a = TpuTensor.from_numpy(np.random.uniform(-1, 1, (3, 4)).astype(np.float32))
    b = TpuTensor.from_numpy(np.random.uniform(-1, 1, (4, 2)).astype(np.float32),
                             requires_grad=False)
    y = a.einsum("ab,bc->ac", b)
    y.sum().backward()
    assert a.grad is not None and a.grad.shape == (3, 4)
    assert b.grad is None


def test_einsum_under_jit_step():
    """einsum records through the step compiler (string config arg)."""
    a = TpuTensor.from_numpy(np.random.uniform(-1, 1, (4, 5)).astype(np.float32))
    b = TpuTensor.from_numpy(np.random.uniform(-1, 1, (5, 3)).astype(np.float32))
    opt = light.optim.SGD([a, b], lr=0.01)

    def step():
        y = light.einsum("ab,bc->ac", a, b)
        loss = (y * y).sum() * (1.0 / 12)
        opt.zero_grad()
        loss.backward()
        opt.step()
        return loss

    fn = light.jit(step)
    losses = [fn().item() for _ in range(3)]
    assert losses[2] < losses[0], losses


@pytest.mark.parametrize("spec,n", [
    ("ab,bc", 2),        # no explicit output
    ("a...b->ab", 1),    # ellipsis
    ("aa->a", 1),        # diagonal
    ("ab,bc->ad", 2),    # output index not in inputs
    ("ab->a", 2),        # operand count mismatch
])
def test_einsum_grammar_asserts(spec, n):
    ts = [TpuTensor.from_numpy(np.ones((2, 2), np.float32)) for _ in range(n)]
    with pytest.raises(AssertionError):
        ts[0].einsum(spec, *ts[1:])
