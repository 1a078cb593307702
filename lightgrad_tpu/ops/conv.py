"""N-D convolution as implicit GEMM on the MXU.

TPU-native successor of the reference's direct OpenCL conv kernel
(``/root/reference/lightgrad/autograd/opencl/kernels.py:510-625``, forward
only) and the CPU im2col path (``cpu/ops.py:298-356``).  On TPU the FLOPs
belong on the MXU, so the kernel strategy is patch-extraction (a static
unrolled set of strided slices -- pure data movement XLA folds into copies)
followed by the Pallas GEMM from ``matmul.py``.  Unlike the reference, the
full backward (input-grad col2im scatter-add + weight-grad GEMM) is provided,
plus dilation (a tap-offset change in the patch slices) and grouped
convolution (``feature_group_count`` on the XLA path; the implicit-GEMM path
blocks the GEMM per group).

Layouts follow the reference API: x ``(B, Cin, *S)``, w ``(Cout, Cin/g, *K)``,
output ``(B, Cout, *S_out)`` with 1/2/3-D spatial support.
"""

import functools
import itertools
from math import prod

import jax
import jax.numpy as jnp

from .runtime import resolve_mode
from .matmul import _matmul_impl

__all__ = ["conv_fwd", "conv_bwd"]


def _norm(v, n):
    return (v,) * n if isinstance(v, int) else tuple(v)


def _out_spatial(spatial, ksize, strides, dilation):
    return tuple(
        (s - ((k - 1) * dl + 1)) // st + 1
        for s, k, st, dl in zip(spatial, ksize, strides, dilation)
    )


def _tap_slices(kidx, strides, dilation, out_sp):
    """Input-side slices selecting kernel tap ``kidx``'s contributions."""
    return tuple(
        slice(ki * dl, ki * dl + st * od, st)
        for ki, st, dl, od in zip(kidx, strides, dilation, out_sp)
    )


def _patches(x, ksize, strides, dilation):
    """x (B, C, *S) -> (B * prod(out_sp), C * prod(K)) patch matrix."""
    n = len(ksize)
    bsz, cin = x.shape[:2]
    out_sp = _out_spatial(x.shape[2:], ksize, strides, dilation)
    cols = []
    for kidx in itertools.product(*[range(k) for k in ksize]):
        sl = _tap_slices(kidx, strides, dilation, out_sp)
        cols.append(x[(slice(None), slice(None)) + sl])
    # (B, C, *out_sp, K) -> (B, *out_sp, C, K)
    stacked = jnp.stack(cols, axis=-1)
    perm = (0,) + tuple(range(2, 2 + n)) + (1, 2 + n)
    stacked = jnp.transpose(stacked, perm)
    return stacked.reshape(bsz * prod(out_sp), cin * prod(ksize)), out_sp


def _dim_numbers(n):
    sp = "DHW"[3 - n :]
    return ("NC" + sp, "OI" + sp, "NC" + sp)


def _xla_conv(x, w, strides, dilation, groups):
    """XLA's native conv emitter -- the optimal MXU path for conv shapes.

    Precision follows dtype: f32 keeps HIGHEST (the 6-pass bf16 emulation
    that makes the tape numerically match the CPU oracle), bf16 inputs run
    the native one-pass MXU mode -- HIGHEST on bf16 would re-issue the
    multi-pass schedule and cap conv MFU at ~1/3 of peak for no accuracy
    (the inputs are already bf16)."""
    n = w.ndim - 2
    prec = (jax.lax.Precision.DEFAULT if x.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding="VALID",
        rhs_dilation=dilation, feature_group_count=groups,
        dimension_numbers=_dim_numbers(n),
        precision=prec,
    )


def _group_matmul(pm, w, groups, cin, ksize):
    """Per-group GEMM: pm (R, Cin*K) x w (Cout, Cin/g, *K) -> (R, Cout).

    The patch matrix interleaves (C, K); slice each group's channel block,
    run the GEMM, concat outputs (static loop, XLA fuses the slices)."""
    cout = w.shape[0]
    kn = prod(ksize)
    cg, og = cin // groups, cout // groups
    pm3 = pm.reshape(pm.shape[0], cin, kn)
    outs = []
    for g in range(groups):
        pg = pm3[:, g * cg:(g + 1) * cg, :].reshape(pm.shape[0], cg * kn)
        wg = w[g * og:(g + 1) * og].reshape(og, cg * kn)
        outs.append(_matmul_impl(pg, wg.T, "pallas"))
    return jnp.concatenate(outs, axis=-1)


def _conv_fwd_impl(x, w, strides, dilation, groups, mode):
    n = w.ndim - 2
    strides, dilation = _norm(strides, n), _norm(dilation, n)
    if mode == "xla":
        return _xla_conv(x, w, strides, dilation, groups)
    bsz, cout = x.shape[0], w.shape[0]
    pm, out_sp = _patches(x, w.shape[2:], strides, dilation)
    if groups == 1:
        out = _matmul_impl(pm, w.reshape(cout, -1).T, mode)  # (B*out, Cout)
    else:
        out = _group_matmul(pm, w, groups, x.shape[1], w.shape[2:])
    out = out.reshape((bsz,) + out_sp + (cout,))
    return jnp.moveaxis(out, -1, 1)


def _conv_bwd_impl(g, x, w, strides, dilation, groups, mode):
    n = w.ndim - 2
    strides, dilation = _norm(strides, n), _norm(dilation, n)
    if mode == "xla" or groups != 1:
        # jax AD emits the canonical transpose convs for input/weight grads
        _, vjp = jax.vjp(
            lambda xx, ww: _xla_conv(xx, ww, strides, dilation, groups), x, w)
        return tuple(vjp(g))
    bsz, cout = x.shape[0], w.shape[0]
    out_sp = g.shape[2:]
    g_flat = jnp.moveaxis(g, 1, -1).reshape(bsz * prod(out_sp), cout)
    pm, _ = _patches(x, w.shape[2:], strides, dilation)
    # weight grad: (Cout, B*out) @ (B*out, C*K)
    gw = _matmul_impl(g_flat.T, pm, mode).reshape(w.shape)
    # input grad: cols = (B*out, C*K), then col2im scatter-add
    gcols = _matmul_impl(g_flat, w.reshape(cout, -1), mode)
    gcols = gcols.reshape((bsz,) + tuple(out_sp) + (x.shape[1],) + w.shape[2:])
    # (B, *out_sp, C, *K) -> (B, C, *out_sp, *K)
    gcols = jnp.moveaxis(gcols, 1 + n, 1)
    gx = jnp.zeros(x.shape, dtype=g.dtype)
    for kidx in itertools.product(*[range(k) for k in w.shape[2:]]):
        sl = _tap_slices(kidx, strides, dilation, out_sp)
        tap = gcols[(Ellipsis,) + kidx]
        gx = gx.at[(slice(None), slice(None)) + sl].add(tap)
    return gx, gw


@functools.lru_cache(maxsize=None)
def _build_fwd(strides, dilation, groups, mode):
    return jax.jit(functools.partial(
        _conv_fwd_impl, strides=strides, dilation=dilation, groups=groups,
        mode=mode))


@functools.lru_cache(maxsize=None)
def _build_bwd(strides, dilation, groups, mode):
    return jax.jit(functools.partial(
        _conv_bwd_impl, strides=strides, dilation=dilation, groups=groups,
        mode=mode))


def _key(v):
    return v if isinstance(v, int) else tuple(v)


@functools.lru_cache(maxsize=1)
def _policy():
    """Measured routing table written by benchmarks/conv_sweep.py (the conv
    analogue of ops/gemm_policy.json): per (dtype, cin->cout, k, stride)
    ResNet-family shape, the faster of XLA's conv emitter and the
    implicit-GEMM Pallas path, with the raw timings as provenance."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "conv_policy.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def _route(x, w, strides):
    """Resolve 'auto' for one conv call against the measured sweep table;
    exact shape-key match first, else the measured per-dtype default
    (XLA when nothing has been measured)."""
    mode = resolve_mode("conv")
    if mode != "auto":
        return mode
    pol = _policy()
    if not pol:
        return "xla"
    tag = "bf16" if x.dtype == jnp.bfloat16 else "f32"
    st = strides if isinstance(strides, int) else strides[0]
    key = f"{tag}:c{x.shape[1]}>{w.shape[0]}k{w.shape[-1]}s{st}"
    ent = pol.get("routes", {}).get(key)
    if ent:
        return ent
    return pol.get("default", {}).get(tag, "xla")


def conv_fwd(x, w, strides=1, dilation=1, groups=1):
    return _build_fwd(_key(strides), _key(dilation), groups,
                      _route(x, w, strides))(x, w)


def conv_bwd(g, x, w, strides=1, dilation=1, groups=1):
    return _build_bwd(_key(strides), _key(dilation), groups,
                      _route(x, w, strides))(g, x, w)
