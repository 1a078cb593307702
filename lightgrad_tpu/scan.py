"""Scan-over-layers: compile depth-L transformer stacks as ONE traced block.

The step compiler (lightgrad_tpu/jit.py) re-traces the whole tape into a
single XLA program -- but a 12-layer model records 12 inlined copies of the
block, so compile time grows linearly with depth (20-40 minutes for
GPT-2-small through a tunneled TPU compiler, ROADMAP "Performance" #3).  The
TPU-idiomatic fix is ``jax.lax.scan`` over stacked per-layer parameters: the
block is traced ONCE and XLA compiles an O(1)-size program (a While loop)
regardless of depth.

``ScannedStack`` holds L structurally identical ``nn.Module`` blocks as
stacked parameter tensors ``(L, ...)`` and applies them with a single tape
op whose forward is ``jax.vjp`` over the scan (the same module-data-swap
bridge as ``parallel.pipeline_1f1b.module_stages``).  The stacked tensors
are the registered parameters -- optimizers update all layers with one fused
op per parameter name -- while ``state_dict``/``load_parameters`` translate
to per-layer names (``h.0.attn...``), so HF checkpoint import/export sees
the same layout as the unscanned model.

Requirements: jax-backed tensors (``TpuTensor``); block forwards must be
jax-differentiable (the pallas matmul/attention kernels carry custom VJPs --
ops/matmul.py::_pallas_vjp, ops/attention.py::_attn_res); no live python-side
randomness inside the block (``Dropout`` must be in eval mode or p=0 --
a scan body traces once, so eager per-call RNG would reuse one mask for
every layer).

The reference has no analogue (its deepest model, examples/bert.py, inlines
12 layers eagerly, bert.py:165-166); this is TPU-first infrastructure.
"""

import jax
import jax.numpy as jnp
import numpy as np

from . import nn
from .autograd import tensor as _tensor_mod
from .autograd.function import Function
from .autograd.tpu.tensor import TpuTensor, _note

__all__ = ["ScannedStack"]


def _t(arr):
    return TpuTensor(_note(arr), requires_grad=False)


def _remat_wrap(body, remat):
    """Apply rematerialization to the scanned block body.

    ``remat`` is False (save everything), True/"full" (recompute the whole
    block in the backward -- ~1/3 extra fwd FLOPs, L-fold smaller stash), or
    the name of a ``jax.checkpoint_policies`` policy.  ``"dots"`` selects
    ``dots_with_no_batch_dims_saveable``: MXU (GEMM) outputs are saved and
    only the cheap elementwise/norm ops between them are recomputed -- on
    TPU this keeps the backward FLOP overhead near zero while still
    dropping the large inter-GEMM temporaries, which is the right default
    whenever the stash (not the params) is what overflows HBM.
    """
    if not remat:
        return body
    if remat is True or remat == "full":
        return jax.checkpoint(body)
    name = {"dots": "dots_with_no_batch_dims_saveable"}.get(remat, remat)
    policy = getattr(jax.checkpoint_policies, name, None)
    if policy is None:
        raise ValueError(
            f"unknown remat policy {remat!r} (use True/'full', 'dots', or a "
            "jax.checkpoint_policies name)")
    return jax.checkpoint(body, policy=policy)


class _scan_blocks(Function):
    """Tape op: y = block(...block(block(x, p[0]), p[1])..., p[L-1]).

    ``body(h, layer_arrays, extra_arrays) -> h`` must be pure jax (built by
    ScannedStack).  ``n_stacked`` splits the tensor operands into stacked
    per-layer parameters (scanned axis 0) and extras broadcast to every
    layer (e.g. an attention mask); both receive gradients.  Forward runs
    ``jax.vjp`` over the scan so backward is the transposed scan -- also
    O(1) program size in depth.
    """

    def forward(ctx, x, *ts, n_stacked=None, body=None, remat=False):
        stacked = tuple(t.data for t in ts[:n_stacked])
        extras = tuple(t.data for t in ts[n_stacked:])
        step = _remat_wrap(body, remat)

        def scan_fn(x_d, stk, ext):
            def f(h, layer):
                return step(h, layer, ext), None

            h, _ = jax.lax.scan(f, x_d, stk)
            return h

        y, vjp = jax.vjp(scan_fn, x.data, stacked, extras)
        ctx.save_for_backward(vjp)
        return _t(y)

    def backward(ctx, g):
        (vjp,) = ctx.get_saved_tensors()
        dx, dstk, dext = vjp(g.data)
        return (_t(dx),) + tuple(_t(d) for d in dstk + dext)


def _has_live_dropout(m):
    if isinstance(m, nn.Dropout) and m.p > 0 and m.training:
        return True
    return any(_has_live_dropout(c) for c in m._modules.values())


class ScannedStack(nn.Module):
    """L structurally identical blocks applied via one ``lax.scan``.

    Parameters are the stacked ``(L, ...)`` tensors; ``blocks[0]`` survives
    as the (parameter-less) template whose tape ops define the block body.
    """

    def __init__(self, blocks, remat: bool = False):
        super().__init__()
        blocks = list(blocks)
        assert blocks, "ScannedStack needs at least one block"
        proto = blocks[0]
        names = [n for n, _ in proto.named_parameters()]
        object.__setattr__(self, "_proto", proto)
        object.__setattr__(self, "_names", names)
        object.__setattr__(self, "n_layers", len(blocks))
        object.__setattr__(self, "remat", remat)
        name_map = {}
        for n in names:
            per = []
            for b in blocks:
                d = dict(b.named_parameters())
                assert n in d, f"block missing parameter {n}"
                p = d[n]
                assert isinstance(p, TpuTensor), (
                    "ScannedStack requires jax-backed (TpuTensor) blocks"
                )
                per.append(p.data)
            t = TpuTensor(jnp.stack(per), requires_grad=True)
            # mirror the stack on the host when every per-layer param kept
            # its host-born value: the jit recorder's CPU staging then
            # rebuilds the (L, ...) buffer locally instead of pulling it
            # back through the (possibly tunneled) device link
            host_per = [getattr(b_p, "_host_value", None) for b_p in
                        (dict(b.named_parameters())[n] for b in blocks)]
            if all(h is not None for h in host_per):
                t._host_value = np.stack(host_per)
            key = n.replace(".", "__")
            setattr(self, key, t)  # registers as parameter
            name_map[n] = key
        object.__setattr__(self, "_name_map", name_map)

    @property
    def _stacked(self):
        """{original-name: stacked tensor}, resolved through _params so
        rebinds (map_parameters, amp.cast_module) stay visible."""
        return {n: self._params[k] for n, k in self._name_map.items()}

    def train(self, mode: bool = True):
        # propagate to the template block (held outside _modules so its
        # placeholder tensors are not registered as parameters)
        self._proto.train(mode)
        return super().train(mode)

    def layer_params(self, l: int) -> dict:
        """{original-name: jax array} view of layer ``l`` (zero-copy slice)."""
        return {n: t.data[l] for n, t in self._stacked.items()}

    def forward(self, x, *extra):
        """Apply all layers.  ``extra`` tensors (e.g. an attention mask) are
        passed unchanged to every layer; ``None`` extras pass through as
        python Nones."""
        proto, names = self._proto, self._names
        assert isinstance(x, TpuTensor), "ScannedStack requires TpuTensor input"
        assert not _has_live_dropout(proto), (
            "ScannedStack: active Dropout inside a scanned block would reuse "
            "one mask for every layer (the body traces once) -- call .eval() "
            "or set p=0"
        )
        pparams = dict(proto.named_parameters())
        extra_slots = [isinstance(e, TpuTensor) for e in extra]
        extra_ts = [e for e in extra if isinstance(e, TpuTensor)]

        def body(h, layer_arrays, extra_arrays):
            # template params swap per-layer arrays in; trace hooks are
            # suspended so the step recorder never sees the template tensors
            # (they are not real parameters)
            prev_trace, _tensor_mod._trace = _tensor_mod._trace, None
            old = [(p, p._raw_data()) for p in pparams.values()]
            try:
                for n, arr in zip(names, layer_arrays):
                    pparams[n]._set_data(arr)
                from .autograd import Gradients

                it = iter(extra_arrays)
                args = [TpuTensor(next(it), requires_grad=False) if is_t else e
                        for is_t, e in zip(extra_slots, extra)]
                with Gradients.no_grad():
                    out = proto(TpuTensor(h, requires_grad=False), *args)
                return out.data
            finally:
                for p, d in old:
                    p._set_data(d)
                _tensor_mod._trace = prev_trace

        stacked_ts = [self._stacked[n] for n in names]
        return _scan_blocks(x, *stacked_ts, *extra_ts,
                            n_stacked=len(stacked_ts), body=body,
                            remat=self.remat)

    # -- checkpoint interop: per-layer names, exactly like a ModuleList -----
    def state_dict(self, prefix: str = "", separator: str = ".") -> dict:
        pfx = (prefix + separator) if prefix else ""
        out = {}
        for n in self._names:
            arr = self._stacked[n].numpy()
            for l in range(self.n_layers):
                out[f"{pfx}{l}{separator}{n}"] = arr[l]
        return out

    def load_parameters(self, param_dict: dict, prefix: str = "",
                        separator: str = ".") -> None:
        param_dict = dict(param_dict)
        pfx = (prefix + separator) if prefix else ""
        for n in self._names:
            t = self._stacked[n]
            per = []
            for l in range(self.n_layers):
                full = f"{pfx}{l}{separator}{n}"
                assert full in param_dict, f"{full} not found in param dict"
                v = param_dict[full]
                if hasattr(v, "numpy"):
                    v = v.numpy()
                per.append(np.asarray(v))
            arr = np.stack(per)
            assert arr.shape == t.shape, (
                f"shape mismatch for {pfx}*{separator}{n}: {arr.shape} != {t.shape}"
            )
            # preserve destination dtype (bf16-cast models stay bf16)
            t._set_data(jnp.asarray(arr).astype(t.data.dtype))
