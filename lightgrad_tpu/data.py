"""Data pipeline: Dataset + MNIST.

API parity with ``/root/reference/lightgrad/data.py``.  The MNIST download
uses mirrors (the original yann.lecun.com host 403s) and falls back to a
deterministic synthetic digit set when the environment has no network (CI /
air-gapped TPU pods), controlled by ``LIGHTGRAD_FAKE_DATA=1``.
"""

import gzip
from math import ceil

import numpy as np

from .autograd import Tensor, no_grad
from .autograd.cpu import CpuTensor
from .utils import fetch
from . import native

__all__ = ["Dataset", "DeviceDataset", "MNIST"]


class Dataset:
    def __init__(self, tensors, shuffle: bool = True, batchsize: int = 8):
        assert all(t.shape[0] == tensors[0].shape[0] for t in tensors[1:])
        self._tensors = tuple(tensors)
        self._shuffle, self._bs = shuffle, batchsize

    @property
    def tensors(self) -> tuple:
        return self._tensors

    @property
    def n(self) -> int:
        return self._tensors[0].shape[0]

    def shuffle(self):
        seed = int(np.random.randint(0, 2**62))
        idx = native.shuffle_perm(self.n, seed)

        def permute(t):
            if isinstance(t, CpuTensor):
                # native parallel row gather on the host
                return type(t).from_numpy(native.gather_rows(t.data, idx), requires_grad=False)
            return t[idx].detach()  # device-side gather for accelerator tensors

        self._tensors = tuple(permute(t) for t in self._tensors)

    def __getitem__(self, i):
        return tuple(t[i, ...].detach() for t in self._tensors)

    def __iter__(self):
        if self._shuffle:
            self.shuffle()
        for i in range(len(self)):
            yield self[i * self._bs : (i + 1) * self._bs]

    def __len__(self) -> int:
        return ceil(self.n / self._bs)


class DeviceDataset(Dataset):
    """Device-resident dataset: the TPU-idiomatic data pipeline.

    The whole dataset is uploaded to the accelerator once; batches are HBM
    slices (the ``narrow`` op) and epoch shuffles are device-side gathers, so
    per-step host<->device traffic is zero.  Batch tensors keep a constant
    shape, which makes them directly compatible with the ``lightgrad_tpu.jit``
    step compiler (the final ragged batch is dropped).
    """

    def __init__(self, tensors, shuffle: bool = True, batchsize: int = 8):
        from .autograd import TpuTensor

        tensors = tuple(
            t if isinstance(t, TpuTensor)
            else TpuTensor.from_numpy(t.numpy() if hasattr(t, "numpy") else t,
                                      requires_grad=False)
            for t in tensors
        )
        super().__init__(tensors, shuffle=shuffle, batchsize=batchsize)

    def __len__(self) -> int:
        return self.n // self._bs  # whole batches only (constant shapes)

    def shuffle(self):
        # device-side gather, swapping buffers IN PLACE so tensors captured
        # by a compiled step (lightgrad_tpu.jit) keep observing fresh epochs
        seed = int(np.random.randint(0, 2**62))
        idx = native.shuffle_perm(self.n, seed)
        with no_grad():
            for t in self._tensors:
                t._set_data(t[idx].detach().data)

    def __getitem__(self, i):
        """Batch ``i`` as zero-copy HBM slices (unlike the base class, the
        index here is a *batch* index, not a row index)."""
        with no_grad():
            return tuple(
                t.narrow(i * self._bs, self._bs).detach() for t in self._tensors
            )

    def __iter__(self):
        if self._shuffle:
            self.shuffle()
        for i in range(len(self)):
            yield self[i]

    def offsets(self):
        """Iterate batch *offsets* as 0-d device scalars (4 bytes of host
        traffic per step).  Use with a jit step that narrows internally::

            step = light.jit(lambda off: train_step(
                xs.narrow(off, B), ys.narrow(off, B)))
            for off in ds.offsets():
                loss = step(off)
        """
        from .autograd import TpuTensor

        if self._shuffle:
            self.shuffle()
        for i in range(len(self)):
            yield TpuTensor.from_numpy(np.int32(i * self._bs), requires_grad=False)


class LMDataset(DeviceDataset):
    """Causal-LM windows over a token stream, device-resident.

    ``tokens`` is a 1-D int array (any tokenizer's output).  Builds
    ``(N, seq)`` input windows and their next-token targets (``stride``
    controls window overlap; default non-overlapping), uploads both to the
    device once, then serves constant-shape batches / traced offsets like
    :class:`DeviceDataset`::

        ds = light.data.LMDataset(token_ids, seq=512, batchsize=8)
        xs, ys = ds.tensors
        step = light.jit(lambda off: train_step(xs.narrow(off, 8),
                                                ys.narrow(off, 8)))
        for off in ds.offsets():
            loss = step(off)

    The epoch shuffle permutes inputs and targets with the SAME device-side
    permutation (DeviceDataset.shuffle), so pairs stay aligned.
    """

    def __init__(self, tokens, seq: int, stride: int = None,
                 shuffle: bool = True, batchsize: int = 8):
        tokens = np.asarray(tokens)
        assert tokens.ndim == 1, f"token stream must be 1-D, got {tokens.shape}"
        assert len(tokens) > seq, (len(tokens), seq)
        stride = stride or seq
        starts = np.arange(0, len(tokens) - seq, stride)
        xs = np.stack([tokens[s:s + seq] for s in starts]).astype(np.int32)
        ys = np.stack([tokens[s + 1:s + seq + 1] for s in starts]).astype(np.int32)
        self.seq = seq
        super().__init__((xs, ys), shuffle=shuffle, batchsize=batchsize)


_MNIST_MIRRORS = [
    "https://storage.googleapis.com/cvdf-datasets/mnist/",
    "https://ossci-datasets.s3.amazonaws.com/mnist/",
]


def _synthetic_digits(n: int, seed: int = 0):
    """Deterministic stand-in digit set: translated dilated class templates."""
    rng = np.random.default_rng(seed)
    ys = rng.integers(0, 10, size=n).astype(np.int16)
    xs = np.zeros((n, 28, 28), dtype=np.float32)
    tmpl_rng = np.random.default_rng(1234)
    templates = (tmpl_rng.random((10, 20, 20)) > 0.6).astype(np.float32)
    for i, y in enumerate(ys):
        dx, dy = rng.integers(0, 8, size=2)
        xs[i, dx : dx + 20, dy : dy + 20] = templates[y]
        xs[i] += rng.normal(0, 0.1, (28, 28)).astype(np.float32)
    return np.clip(xs, 0, 1), ys


class MNIST(Dataset):
    def __init__(self, train: bool = True, n: int = 60_000, **kwargs):
        import os

        n = min(n, 60_000 if train else 10_000)
        img_name = "train-images-idx3-ubyte.gz" if train else "t10k-images-idx3-ubyte.gz"
        lbl_name = "train-labels-idx1-ubyte.gz" if train else "t10k-labels-idx1-ubyte.gz"
        x = y = None
        if os.environ.get("LIGHTGRAD_FAKE_DATA") != "1":
            for base in _MNIST_MIRRORS:
                try:
                    parse = lambda raw: np.frombuffer(gzip.decompress(raw), dtype=np.uint8)
                    x = parse(fetch(base + img_name))[0x10 : 0x10 + n * 28 * 28]
                    x = x.reshape(-1, 28, 28).astype(np.float32) / 255.0
                    y = parse(fetch(base + lbl_name))[8 : 8 + n].astype(np.int16)
                    break
                except Exception as e:  # noqa: BLE001 - any network failure -> next mirror
                    print(f"MNIST fetch from {base} failed: {e}")
        if x is None:
            print("MNIST unavailable; using deterministic synthetic digits")
            x, y = _synthetic_digits(n, seed=0 if train else 1)
        super().__init__(
            (Tensor.from_numpy(x, requires_grad=False),
             Tensor.from_numpy(y, requires_grad=False)),
            **kwargs,
        )
