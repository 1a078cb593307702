"""Dependency-light PyTorch checkpoint reader.

Parity target: ``load_torch_state_dict`` (reference utils.py:16-75), which
reads the *legacy* pytorch pickle format.  Modern HuggingFace
``pytorch_model.bin`` files use the zip container format, so we implement that
natively (zipfile + a restricted Unpickler that rebuilds storages as numpy
arrays) and fall back to ``torch.load`` (CPU torch is an optional convenience,
never required on the TPU compute path) for legacy files.

Returns ``{parameter_name: np.ndarray}``.
"""

import io
import pickle
import zipfile

import numpy as np

__all__ = ["load_torch_state_dict"]

_TORCH_DTYPES = {
    "FloatStorage": np.dtype(np.float32),
    "DoubleStorage": np.dtype(np.float64),
    "HalfStorage": np.dtype(np.float16),
    "LongStorage": np.dtype(np.int64),
    "IntStorage": np.dtype(np.int32),
    "ShortStorage": np.dtype(np.int16),
    "CharStorage": np.dtype(np.int8),
    "ByteStorage": np.dtype(np.uint8),
    "BoolStorage": np.dtype(np.bool_),
    "BFloat16Storage": None,  # no numpy bfloat16: widened to float32 below
}


class _Storage:
    def __init__(self, dtype_name: str, raw: bytes):
        self.dtype_name = dtype_name
        self.raw = raw

    def as_array(self) -> np.ndarray:
        if self.dtype_name == "BFloat16Storage":
            u16 = np.frombuffer(self.raw, dtype=np.uint16)
            return (u16.astype(np.uint32) << 16).view(np.float32)
        return np.frombuffer(self.raw, dtype=_TORCH_DTYPES[self.dtype_name])


def _rebuild_tensor(storage: _Storage, offset, size, stride, *extra):
    arr = storage.as_array()
    itemsize = arr.dtype.itemsize
    return np.lib.stride_tricks.as_strided(
        arr[offset:], shape=tuple(size), strides=tuple(s * itemsize for s in stride)
    ).copy()


class _NamedMarker:
    """Stands in for a torch storage class; only its name is needed."""

    def __init__(self, name):
        self.__name__ = name


class _AttrDict(dict):
    """dict that tolerates the attribute state torch pickles onto OrderedDict."""


def _load_zip_format(data: bytes) -> dict:
    zf = zipfile.ZipFile(io.BytesIO(data))
    pkl_name = next(n for n in zf.namelist() if n.endswith("data.pkl"))
    prefix = pkl_name[: -len("data.pkl")]

    class Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module.startswith("torch"):
                if name in _TORCH_DTYPES:
                    return _NamedMarker(name)
                if name in ("_rebuild_tensor_v2", "_rebuild_tensor"):
                    return _rebuild_tensor
                return lambda *a, **k: None  # metadata we don't need
            if module == "collections" and name == "OrderedDict":
                return _AttrDict
            raise pickle.UnpicklingError(f"blocked global {module}.{name}")

        def persistent_load(self, pid):
            kind, storage_cls, key, _location, _numel = pid
            assert kind == "storage"
            return _Storage(storage_cls.__name__, zf.read(f"{prefix}data/{key}"))

    state = Unpickler(io.BytesIO(zf.read(pkl_name))).load()
    return {k: v for k, v in state.items() if isinstance(v, np.ndarray)}


def load_torch_state_dict(data: bytes) -> dict:
    if zipfile.is_zipfile(io.BytesIO(data)):
        return _load_zip_format(data)
    # legacy (pre-1.6) serialized format: delegate to torch if present
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "legacy torch checkpoint format requires the optional torch package"
        ) from e
    state = torch.load(io.BytesIO(data), map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in state.items()}
