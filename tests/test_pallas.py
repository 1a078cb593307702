"""Pallas kernel validation (interpret mode on CPU).

Compares every hand-written Pallas kernel family against its XLA
implementation on a focused shape matrix -- tile-aligned, ragged, broadcast,
and tiny shapes.  This is the CI stand-in for real-TPU runs (the analogue of
the reference's POCL trick); the same suite passes on hardware with
``LIGHTGRAD_TEST_TPU=1``.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lightgrad_tpu.ops import runtime
from lightgrad_tpu.ops.elementwise import ew
from lightgrad_tpu.ops.matmul import matmul
from lightgrad_tpu.ops.reduce import reduce as kreduce
from lightgrad_tpu.ops.conv import conv_fwd, conv_bwd

np.random.seed(99)


@pytest.fixture(autouse=True)
def pallas_mode():
    np.random.seed(99)
    prev = runtime.set_kernel_mode("pallas")
    yield
    runtime.set_kernel_mode(prev)


def rnd(*shape, lo=-1.0, hi=1.0):
    return jnp.asarray(np.random.uniform(lo, hi, shape).astype(np.float32))


# module-level fns for stable jit identity
def f_addmul(a, b):
    return a * b + a


def f_two_out(g, a, b):
    return g * b, g * a


def f_exp(x):
    return jnp.exp(x)


@pytest.mark.parametrize(
    "sa,sb",
    [
        ((128, 256), (128, 256)),     # aligned
        ((13, 57), (13, 57)),         # ragged
        ((4, 1, 7), (4, 5, 7)),       # middle broadcast
        ((128, 256), (256,)),         # trailing broadcast (bias pattern)
        ((3, 5), ()),                 # scalar operand
        ((2, 3, 4, 5), (1, 3, 1, 5)), # multi-dim broadcast
        ((7,), (7,)),                 # 1-D
    ],
)
def test_elementwise_binary(sa, sb):
    a, b = rnd(*sa), rnd(*sb)
    got = ew(f_addmul, a, b)
    runtime.set_kernel_mode("xla")
    want = ew(f_addmul, a, b)
    runtime.set_kernel_mode("pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_elementwise_unary_ragged():
    x = rnd(33, 129)
    # TPU VPU exp carries ~1 extra ulp vs libm
    np.testing.assert_allclose(
        np.asarray(ew(f_exp, x)), np.exp(np.asarray(x)), rtol=1e-5, atol=1e-6
    )


def test_elementwise_multi_output():
    g, a, b = rnd(16, 40), rnd(16, 40), rnd(1, 40)
    ga, gb = ew(f_two_out, g, a, b, n_out=2)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(g) * np.asarray(b), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(g) * np.asarray(a), rtol=1e-6)


@pytest.mark.parametrize(
    "sa,sb",
    [
        ((128, 128), (128, 128)),     # single tile
        ((256, 512), (512, 128)),     # multi-tile K
        ((13, 54), (54, 76)),         # ragged everything
        ((1, 700), (700, 3)),         # skinny
        ((3, 33, 20), (3, 20, 17)),   # batched ragged
        ((2, 2, 8, 16), (2, 2, 16, 8)),  # 4-D batch
        ((5, 9), (1, 9, 4)),          # broadcast batch
    ],
)
def test_matmul(sa, sb):
    a, b = rnd(*sa), rnd(*sb)
    got = np.asarray(matmul(a, b))
    want = np.matmul(np.asarray(a), np.asarray(b))
    # f32 K-loop accumulation order differs from numpy's blocked dot
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("op", ["sum", "max", "min"])
@pytest.mark.parametrize(
    "shape,axis,keepdims",
    [
        ((128, 256), None, False),
        ((128, 256), 0, False),
        ((128, 256), 1, True),
        ((13, 57), 1, False),         # ragged reduce dim (boundary masking)
        ((3, 5, 7), (0, 2), False),   # multi-axis
        ((6,), None, False),          # 1-D full
        ((2, 3, 2049), 2, False),     # reduce dim > one block
    ],
)
def test_reduce(op, shape, axis, keepdims):
    x = rnd(*shape)
    got = np.asarray(kreduce(x, op, axis=axis, keepdims=keepdims))
    want = getattr(np, op)(np.asarray(x), axis=axis, keepdims=keepdims)
    # f32 sums accumulate in different orders than numpy's pairwise algorithm
    tol = 1e-4 if op == "sum" else 1e-6
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("dim", [1, 2, 3])
def test_conv_fwd_bwd_vs_xla(dim, stride):
    x = rnd(2, 3, *([8] * dim))
    w = rnd(4, 3, *([3] * dim))
    got = conv_fwd(x, w, stride)
    runtime.set_kernel_mode("xla")
    want = conv_fwd(x, w, stride)
    g = rnd(*want.shape)
    wx, ww = conv_bwd(g, x, w, stride)
    runtime.set_kernel_mode("pallas")
    gx, gw = conv_bwd(g, x, w, stride)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(wx), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(ww), rtol=1e-5, atol=1e-5)


def test_tape_gradcheck_under_pallas():
    """End-to-end: the eager tape on pallas kernels passes gradcheck."""
    from lightgrad_tpu.autograd import TpuTensor
    from .common import check_gradients

    check_gradients(TpuTensor, "mul", shapes=[(6, 9), (6, 9)], broadcast=True)
    check_gradients(TpuTensor, "dot", shapes=[(5, 7), (7, 4)])
    check_gradients(TpuTensor, "sum", shapes=[(4, 5)], axis=1)
    check_gradients(
        TpuTensor, lambda x: x.softmax(axis=-1), shapes=[(4, 6)]
    )


# ---------------------------------------------------------------------------
# fused layer kernels: softmax / layernorm / flash attention
# ---------------------------------------------------------------------------
from lightgrad_tpu.ops.softmax import softmax_fwd, softmax_bwd
from lightgrad_tpu.ops.layernorm import layernorm_fwd, layernorm_bwd_dx
from lightgrad_tpu.ops.attention import attention_fwd, attention_fwd_res, attention_bwd


@pytest.mark.parametrize("shape", [(8, 128), (3, 5, 33), (2, 1, 2049)])
def test_fused_softmax(shape):
    x = rnd(*shape, lo=-3, hi=3)
    got = np.asarray(softmax_fwd(x))
    runtime.set_kernel_mode("xla")
    want = np.asarray(softmax_fwd(x))
    runtime.set_kernel_mode("pallas")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    g = rnd(*shape)
    got_b = np.asarray(softmax_bwd(g, jnp.asarray(want)))
    runtime.set_kernel_mode("xla")
    want_b = np.asarray(softmax_bwd(g, jnp.asarray(want)))
    runtime.set_kernel_mode("pallas")
    np.testing.assert_allclose(got_b, want_b, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("shape,norm", [((6, 33, 64), (64,)), ((13, 257), (257,))])
def test_fused_layernorm(shape, norm):
    x, w, b = rnd(*shape), rnd(*norm), rnd(*norm)
    y, xhat, rstd = layernorm_fwd(x, w, b, 1e-5)
    runtime.set_kernel_mode("xla")
    y2, xhat2, rstd2 = layernorm_fwd(x, w, b, 1e-5)
    runtime.set_kernel_mode("pallas")
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-5, atol=1e-5)
    g = rnd(*shape)
    r = xhat.shape[0]
    g2 = g.reshape(r, -1)
    dx = layernorm_bwd_dx(g2, w, xhat, rstd)
    runtime.set_kernel_mode("xla")
    dx2 = layernorm_bwd_dx(g2, w, xhat2, rstd2)
    runtime.set_kernel_mode("pallas")
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx2), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("b,s,d", [(2, 64, 32), (3, 33, 64), (1, 300, 64)])
def test_flash_attention_fwd(b, s, d):
    q, k, v = rnd(b, s, d), rnd(b, s, d), rnd(b, s, d)
    scale = 1.0 / np.sqrt(d)
    got = np.asarray(attention_fwd(q, k, v, scale))
    runtime.set_kernel_mode("xla")
    want = np.asarray(attention_fwd(q, k, v, scale))
    runtime.set_kernel_mode("pallas")
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_tape_ops_gradcheck():
    """layernorm / attention / softmax tape ops pass gradcheck under pallas."""
    from lightgrad_tpu.autograd import TpuTensor
    from lightgrad_tpu.utils.gradcheck import assert_gradcheck

    np.random.seed(5)
    w = TpuTensor.from_numpy(np.random.uniform(0.5, 1.5, 8).astype(np.float32))
    b = TpuTensor.from_numpy(np.random.uniform(-0.5, 0.5, 8).astype(np.float32))
    x = TpuTensor.from_numpy(np.random.uniform(-1, 1, (4, 8)).astype(np.float32))
    assert_gradcheck(lambda t: t.layernorm(w, b, eps=1e-5), x, atol=2e-3, rtol=2e-3)
    assert_gradcheck(lambda t: x.layernorm(t, b, eps=1e-5), w, atol=2e-3, rtol=2e-3)
    assert_gradcheck(lambda t: x.layernorm(w, t, eps=1e-5), b, atol=2e-3, rtol=2e-3)

    q = TpuTensor.from_numpy(np.random.uniform(-1, 1, (2, 5, 4)).astype(np.float32))
    k = TpuTensor.from_numpy(np.random.uniform(-1, 1, (2, 5, 4)).astype(np.float32))
    v = TpuTensor.from_numpy(np.random.uniform(-1, 1, (2, 5, 4)).astype(np.float32))
    assert_gradcheck(lambda t: t.attention(k, v, scale=0.5), q, atol=2e-3, rtol=2e-3)
    assert_gradcheck(lambda t: q.attention(t, v, scale=0.5), k, atol=2e-3, rtol=2e-3)
    assert_gradcheck(lambda t: q.attention(k, t, scale=0.5), v, atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("b,s,d", [(2, 64, 32), (1, 300, 64)])
def test_flash_attention_bwd(b, s, d, causal):
    """Flash dQ/dK/dV kernels vs the fused recompute backward."""
    q, k, v, g = (rnd(b, s, d) for _ in range(4))
    scale = 1.0 / np.sqrt(d)
    out, lse = attention_fwd_res(q, k, v, scale, causal=causal)
    got = attention_bwd(g, q, k, v, scale, causal=causal, out=out, lse=lse)
    runtime.set_kernel_mode("xla")
    want = attention_bwd(g, q, k, v, scale, causal=causal)
    runtime.set_kernel_mode("pallas")
    for name, a, b_ in zip("dq dk dv".split(), got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4, err_msg=name
        )


@pytest.mark.parametrize("causal,window", [(False, 0), (True, 0), (True, 48)])
def test_flash_pair_fwd_matches_single(causal, window):
    """Head-pair forward (two heads per grid step, the measured 2x d=64
    lever) vs the one-head kernel: identical out AND lse on eligible
    shapes, including causal and sliding-window banding."""
    from lightgrad_tpu.ops import attention as A

    q, k, v = rnd(4, 128, 64), rnd(4, 128, 64), rnd(4, 128, 64)
    scale = 1.0 / np.sqrt(64)
    assert A._PAIR_FWD  # default-on for the non-causal eligible case
    prev = A.set_flash_pair("all")  # exercise the causal/window pair paths
    try:
        out_p, lse_p = A._flash_fwd(q, k, v, scale, causal, window=window)
        A.set_flash_pair(False)
        out_s, lse_s = A._flash_fwd(q, k, v, scale, causal, window=window)
    finally:
        A.set_flash_pair(prev)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_s),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lse_p), np.asarray(lse_s),
                               rtol=1e-5, atol=1e-5)


def test_flash_pair_ineligible_shapes_fall_back():
    """Odd head count / GQA / lengths / d>64 take the one-head kernel --
    same results either way (the switch must not change semantics)."""
    from lightgrad_tpu.ops import attention as A

    scale = 0.125
    # odd b: falls back internally; compare against xla reference
    q, k, v = rnd(3, 96, 64), rnd(3, 96, 64), rnd(3, 96, 64)
    out, _ = A._flash_fwd(q, k, v, scale, False)
    runtime.set_kernel_mode("xla")
    want = attention_fwd(q, k, v, scale)
    runtime.set_kernel_mode("pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # per-example lengths force the one-head kernel (pair rows may span
    # different examples in general)
    out_l, _ = A._flash_fwd(q[:2], k[:2], v[:2], scale, False,
                            lengths=np.array([50, 96]))
    assert np.isfinite(np.asarray(out_l)).all()


def test_flash_causal_fwd_matches_xla():
    q, k, v = rnd(2, 40, 32), rnd(2, 40, 32), rnd(2, 40, 32)
    out, lse = attention_fwd_res(q, k, v, 0.2, causal=True)
    runtime.set_kernel_mode("xla")
    want, wlse = attention_fwd_res(q, k, v, 0.2, causal=True)
    runtime.set_kernel_mode("pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(lse).squeeze(-1), np.asarray(wlse).squeeze(-1), rtol=1e-5, atol=1e-5
    )


def test_flash_attention_bf16():
    """bf16 flash fwd+bwd run (DEFAULT MXU precision -- HIGHEST on bf16
    operands crashes Mosaic on silicon) and match the bf16 XLA path at
    bf16-appropriate tolerance."""
    import jax
    import jax.numpy as jnp
    from lightgrad_tpu.ops.attention import _flash_fwd, _flash_bwd, _attn_fwd_impl

    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(0, 0.5, (2, 256, 64)), dtype=jnp.bfloat16)
               for _ in range(3))
    scale = 0.125
    out, lse = jax.jit(lambda a, b, c: _flash_fwd(a, b, c, scale, False))(q, k, v)
    assert out.dtype == jnp.bfloat16
    want = _attn_fwd_impl(q, k, v, scale, mode="xla", causal=False)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want, np.float32),
        rtol=5e-2, atol=3e-2)
    g = jnp.ones_like(out)
    dq, dk, dv = jax.jit(
        lambda g, a, b, c, o, l: _flash_bwd(g, a, b, c, o, l, scale, False)
    )(g, q, k, v, out, lse)
    assert dq.dtype == jnp.bfloat16
    assert all(np.isfinite(np.asarray(x, np.float32)).all() for x in (dq, dk, dv))


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("mode", ["pallas", "xla"])
def test_flash_attention_with_lengths(mode, causal):
    """Per-example valid lengths (right padding) inside the flash kernel:
    fwd + all three grads match a materialized additive-mask oracle, with
    padded query rows outputting exactly zero."""
    import jax
    import jax.numpy as jnp
    from lightgrad_tpu.ops import runtime
    from lightgrad_tpu.ops.attention import attention_fwd_res

    rng = np.random.default_rng(0)
    b, s, d = 3, 40, 16  # s % default bk != 0: exercises OOB + lens masking
    q, k, v = (jnp.asarray(rng.normal(0, 0.5, (b, s, d)).astype(np.float32))
               for _ in range(3))
    lens = jnp.asarray([40, 17, 5], jnp.int32)
    scale = 1.0 / np.sqrt(d)

    def oracle(q, k, v):
        scores = jnp.einsum("bqd,bkd->bqk", q, k) * scale
        colm = jnp.where(jnp.arange(s)[None, :] < lens[:, None], 0.0, -1e30)
        scores = scores + colm[:, None, :]
        if causal:
            cm = jnp.where(jnp.arange(s)[None, :] <= jnp.arange(s)[:, None],
                           0.0, -1e30)
            scores = scores + cm
        p = jax.nn.softmax(scores, axis=-1)
        rowv = (jnp.arange(s)[None, :] < lens[:, None])[..., None]
        return jnp.where(rowv, jnp.einsum("bqk,bkd->bqd", p, v), 0.0)

    prev = runtime.set_kernel_mode(mode)
    try:
        def f(q, k, v):
            out, _ = attention_fwd_res(q, k, v, scale, causal=causal,
                                       lengths=lens)
            return out

        out = f(q, k, v)
        want = oracle(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)
        # padded rows exactly zero
        assert np.abs(np.asarray(out)[1, 17:]).max() == 0.0
        assert np.abs(np.asarray(out)[2, 5:]).max() == 0.0

        cot = jnp.asarray(rng.normal(0, 1, (b, s, d)).astype(np.float32))
        g = jax.grad(lambda *a: jnp.sum(f(*a) * cot), argnums=(0, 1, 2))
        gw = jax.grad(lambda *a: jnp.sum(oracle(*a) * cot), argnums=(0, 1, 2))
        for got, want, name in zip(g(q, k, v), gw(q, k, v), "qkv"):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=3e-4, atol=3e-5, err_msg=name)
    finally:
        runtime.set_kernel_mode(prev)


def test_tape_attention_lengths_matches_masked_path():
    """The tape-level attention op with lengths == BERT's materialized
    additive-mask path, through fwd AND backward (grads on q/k/v)."""
    import jax.numpy as jnp
    from lightgrad_tpu.autograd import TpuTensor

    rng = np.random.default_rng(1)
    b, h, s, d = 2, 3, 24, 8
    mk = lambda: TpuTensor.from_numpy(
        rng.normal(0, 0.5, (b, h, s, d)).astype(np.float32))
    q1, k1, v1 = mk(), mk(), mk()
    lens_np = np.asarray([24, 9], np.int32)
    lens = TpuTensor.from_numpy(lens_np, requires_grad=False)
    scale = 1.0 / np.sqrt(d)

    out = q1.attention(k1, v1, scale=scale, lengths=lens)
    (out * out).sum().backward()

    q2 = TpuTensor.from_numpy(q1.numpy())
    k2 = TpuTensor.from_numpy(k1.numpy())
    v2 = TpuTensor.from_numpy(v1.numpy())
    colm = np.where(np.arange(s)[None, :] < lens_np[:, None], 0.0, -1e30)
    mask = TpuTensor.from_numpy(
        colm[:, None, None, :].astype(np.float32), requires_grad=False)
    scores = (q2 @ k2.transpose(0, 1, 3, 2)) * scale + mask
    probs = scores.softmax(axis=-1)
    ref = probs @ v2
    # zero the padded query rows like the kernel does
    rowv = (np.arange(s)[None, :] < lens_np[:, None])[:, None, :, None]
    ref = ref * TpuTensor.from_numpy(rowv.astype(np.float32),
                                     requires_grad=False)
    np.testing.assert_allclose(out.numpy(), ref.numpy(), rtol=2e-4, atol=2e-5)
    (ref * ref).sum().backward()
    for a, b_ in ((q1, q2), (k1, k2), (v1, v2)):
        np.testing.assert_allclose(a.grad.numpy(), b_.grad.numpy(),
                                   rtol=3e-4, atol=3e-5)
