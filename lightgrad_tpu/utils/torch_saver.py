"""Dependency-light PyTorch checkpoint WRITER (HF-interoperable export).

The save-side complement of ``load_torch_state_dict`` (the reference only
*reads* torch checkpoints, utils.py:16-75): ``save_torch_state_dict`` writes
the modern zip container (``archive/data.pkl`` + raw storage files) that
``torch.load`` and HuggingFace ``from_pretrained`` consume.  The pickle
stream referencing ``torch._utils._rebuild_tensor_v2`` is emitted as raw
opcodes -- the stdlib pickler would try to import-and-verify those globals,
so torch itself is never touched, let alone required.

Exports round-trip through our own reader bit-exactly and load with real
``torch.load`` (tests/test_nn.py).
"""

import io
import struct
import zipfile

import numpy as np

__all__ = ["save_torch_state_dict"]

_STORAGE_NAMES = {
    np.dtype(np.float32): "FloatStorage",
    np.dtype(np.float64): "DoubleStorage",
    np.dtype(np.float16): "HalfStorage",
    np.dtype(np.int64): "LongStorage",
    np.dtype(np.int32): "IntStorage",
    np.dtype(np.int16): "ShortStorage",
    np.dtype(np.int8): "CharStorage",
    np.dtype(np.uint8): "ByteStorage",
    np.dtype(np.bool_): "BoolStorage",
}


class _Emitter:
    """Minimal protocol-2 pickle opcode writer for the fixed checkpoint
    structure ``{name: _rebuild_tensor_v2(pid, 0, size, stride, False, {})}``."""

    def __init__(self):
        self.out = io.BytesIO()
        self.w = self.out.write
        self.w(b"\x80\x02")  # PROTO 2

    def unicode(self, s: str):
        raw = s.encode("utf-8")
        self.w(b"X" + struct.pack("<I", len(raw)) + raw)  # BINUNICODE

    def integer(self, n: int):
        if 0 <= n < 256:
            self.w(b"K" + bytes([n]))                     # BININT1
        else:
            self.w(b"J" + struct.pack("<i", n))           # BININT

    def boolean(self, b: bool):
        self.w(b"\x88" if b else b"\x89")                 # NEWTRUE / NEWFALSE

    def global_(self, module: str, name: str):
        self.w(b"c" + module.encode() + b"\n" + name.encode() + b"\n")

    def mark(self):
        self.w(b"(")

    def tuple_(self):
        self.w(b"t")                                      # TUPLE (from MARK)

    def int_tuple(self, items):
        self.mark()
        for n in items:
            self.integer(n)
        self.tuple_()

    def finish_dict_item(self):
        self.w(b"s")                                      # SETITEM

    def tensor(self, key: str, storage_name: str, numel: int, shape, stride):
        # _rebuild_tensor_v2(pid, 0, size, stride, False, {}) where pid is
        # the persistent tuple ('storage', <torch.XStorage>, key, 'cpu', numel)
        self.global_("torch._utils", "_rebuild_tensor_v2")
        self.mark()                                       # args tuple
        self.mark()                                       # pid tuple
        self.unicode("storage")
        self.global_("torch", storage_name)
        self.unicode(key)
        self.unicode("cpu")
        self.integer(numel)
        self.tuple_()
        self.w(b"Q")                                      # BINPERSID
        self.integer(0)
        self.int_tuple(shape)
        self.int_tuple(stride)
        self.boolean(False)
        self.w(b"}")                                      # EMPTY_DICT (hooks)
        self.tuple_()
        self.w(b"R")                                      # REDUCE

    def dump_state(self, entries):
        """entries: [(name, key, storage_name, numel, shape, stride)]"""
        self.w(b"}")                                      # EMPTY_DICT
        for name, key, sname, numel, shape, stride in entries:
            self.unicode(name)
            self.tensor(key, sname, numel, shape, stride)
            self.finish_dict_item()
        self.w(b".")                                      # STOP
        return self.out.getvalue()


def _storage_name(arr: np.ndarray) -> str:
    if arr.dtype.kind == "V" or arr.dtype.name == "bfloat16":
        return "BFloat16Storage"
    name = _STORAGE_NAMES.get(arr.dtype)
    if name is None:
        raise TypeError(f"unsupported dtype for torch export: {arr.dtype}")
    return name


def save_torch_state_dict(state: dict, path: str, archive_name: str = "archive"):
    """Write ``{name: np.ndarray}`` as a torch-zip checkpoint at ``path``."""
    entries, raws = [], {}
    for i, (name, arr) in enumerate(state.items()):
        arr = np.ascontiguousarray(np.asarray(arr))
        key = str(i)
        sname = _storage_name(arr)
        raw = (arr.view(np.uint16).tobytes() if sname == "BFloat16Storage"
               else arr.tobytes())
        stride = tuple(s // max(arr.dtype.itemsize, 1) for s in arr.strides)
        entries.append((name, key, sname, int(arr.size), tuple(arr.shape), stride))
        raws[key] = raw

    pkl = _Emitter().dump_state(entries)
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED) as z:
        z.writestr(f"{archive_name}/data.pkl", pkl)
        for key, raw in raws.items():
            z.writestr(f"{archive_name}/data/{key}", raw)
        z.writestr(f"{archive_name}/version", "3\n")
        z.writestr(f"{archive_name}/byteorder", "little")
