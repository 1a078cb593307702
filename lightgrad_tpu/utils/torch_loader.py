"""Dependency-free PyTorch checkpoint reader.

Parity target: ``load_torch_state_dict`` (reference utils.py:16-75), which
reads the *legacy* (pre-1.6) pytorch pickle format.  Both container formats are
implemented natively here -- the modern zip container (what HuggingFace
ships) AND the legacy stream format (magic/protocol/sysinfo pickles, a main
pickle with lazy storage references, then length-prefixed raw storage
payloads) -- with a restricted Unpickler; no torch import on any path.

Returns ``{parameter_name: np.ndarray}``.
"""

import io
import pickle
import struct
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


class _LazyTensor:
    """Tensor placeholder built while storage payloads are still unread
    (legacy format writes ALL pickles before ANY raw data)."""

    def __init__(self, storage, offset, size, stride):
        self.storage, self.offset = storage, offset
        self.size, self.stride = tuple(size), tuple(stride)

    def materialize(self) -> np.ndarray:
        arr = self.storage.as_array()
        itemsize = arr.dtype.itemsize
        return np.lib.stride_tricks.as_strided(
            arr[self.offset:], shape=self.size,
            strides=tuple(s * itemsize for s in self.stride)
        ).copy()


def _legacy_itemsize(dtype_name: str) -> int:
    if dtype_name == "BFloat16Storage":
        return 2
    return _TORCH_DTYPES[dtype_name].itemsize


def _load_legacy_format(data: bytes) -> dict:
    """The pre-1.6 stream format (what the reference reads, utils.py:16-75):
    magic + protocol + sys_info pickles, the main pickle whose persistent ids
    reference storages lazily, a pickle listing the storage keys, then each
    storage as ``int64 numel`` + raw bytes in that key order."""
    f = io.BytesIO(data)
    magic = pickle.load(f)
    assert magic == 0x1950A86A20F9469CFC6C, "not a legacy torch checkpoint"
    pickle.load(f)  # protocol version
    pickle.load(f)  # sys_info (endianness, type sizes)

    storages = {}  # root_key -> (_Storage with raw=None, numel)

    def rebuild_lazy(storage, offset, size, stride, *extra):
        return _LazyTensor(storage, offset, size, stride)

    class Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module.startswith("torch"):
                if name in _TORCH_DTYPES:
                    return _NamedMarker(name)
                if name in ("_rebuild_tensor_v2", "_rebuild_tensor"):
                    return rebuild_lazy
                return lambda *a, **k: None
            if module == "collections" and name == "OrderedDict":
                return _AttrDict
            raise pickle.UnpicklingError(f"blocked global {module}.{name}")

        def persistent_load(self, pid):
            kind, storage_cls, root_key, _location, numel = pid[:5]
            assert kind == "storage"
            if root_key not in storages:
                storages[root_key] = (_Storage(storage_cls.__name__, None), numel)
            store, _ = storages[root_key]
            view_meta = pid[5] if len(pid) > 5 else None
            if view_meta:
                # (view_key, offset_in_elements, view_numel) into the root
                _view_key, offset, _n = view_meta
                return _StorageSlice(store, offset)
            return store

    state = Unpickler(f).load()
    keys = pickle.load(f)
    for key in keys:
        (numel,) = struct.unpack("<q", f.read(8))
        store, _ = storages[key]
        store.raw = f.read(numel * _legacy_itemsize(store.dtype_name))
    out = {}
    for k, v in state.items():
        if isinstance(v, _LazyTensor):
            out[k] = v.materialize()
        elif isinstance(v, np.ndarray):
            out[k] = v
    return out


class _StorageSlice:
    """A legacy storage view: shares the root storage's bytes at an offset."""

    def __init__(self, root, offset):
        self.root, self.offset = root, offset
        self.dtype_name = root.dtype_name

    def as_array(self) -> np.ndarray:
        return self.root.as_array()[self.offset:]


def load_torch_state_dict(data: bytes) -> dict:
    """Read a pytorch checkpoint (zip or legacy stream) with zero torch
    dependency, mirroring the reference's capability (utils.py:16-75) plus
    the modern format the reference cannot read."""
    if zipfile.is_zipfile(io.BytesIO(data)):
        return _load_zip_format(data)
    return _load_legacy_format(data)
