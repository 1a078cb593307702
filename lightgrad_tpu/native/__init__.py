"""ctypes bridge to the native (C++) host runtime core.

Auto-builds ``libltgnative.so`` with the in-tree Makefile on first import and
degrades gracefully to numpy when no toolchain is available (set
``LIGHTGRAD_NATIVE=0`` to force the numpy path).  See ``dataloader.cc`` for
the exported surface.
"""

import ctypes
import hashlib
import os
import subprocess

import numpy as np

__all__ = ["available", "u8_to_f32", "shuffle_perm", "gather_rows",
           "one_hot", "bpe_new", "bpe_encode", "bpe_encode_batch"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libltgnative.so")
_HASH_PATH = _LIB_PATH + ".srchash"
_lib = None


def _src_hash() -> str:
    h = hashlib.sha256()
    for src in ("dataloader.cc", "bpe.cc"):
        with open(os.path.join(_DIR, src), "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def _load():
    global _lib
    if _lib is not None or os.environ.get("LIGHTGRAD_NATIVE") == "0":
        return _lib
    try:
        # Rebuild unless a sidecar hash proves the .so was built from the
        # current source on this machine (mtimes are unreliable after a fresh
        # clone, and a committed binary must never be trusted/loaded as-is).
        want = _src_hash()
        have = None
        if os.path.exists(_LIB_PATH) and os.path.exists(_HASH_PATH):
            with open(_HASH_PATH) as f:
                have = f.read().strip()
        if have != want:
            subprocess.run(
                ["make", "-s", "-B"], cwd=_DIR, check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            with open(_HASH_PATH, "w") as f:
                f.write(want)
        lib = ctypes.CDLL(_LIB_PATH)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.lg_u8_to_f32.argtypes = [u8p, f32p, ctypes.c_int64, ctypes.c_float]
        lib.lg_shuffle_perm.argtypes = [i64p, ctypes.c_int64, ctypes.c_uint64]
        lib.lg_gather_rows.argtypes = [u8p, i64p, ctypes.c_int64, ctypes.c_int64, u8p]
        lib.lg_one_hot.argtypes = [i32p, f32p, ctypes.c_int64, ctypes.c_int64]
        lib.lg_bpe_new.argtypes = [i32p, i32p, i32p, ctypes.c_int64]
        lib.lg_bpe_new.restype = ctypes.c_int64
        lib.lg_bpe_encode.argtypes = [ctypes.c_int64, i32p, ctypes.c_int64, i32p]
        lib.lg_bpe_encode.restype = ctypes.c_int64
        lib.lg_bpe_encode_batch.argtypes = [ctypes.c_int64, i32p, i64p,
                                            ctypes.c_int64, i32p, i64p]
        lib.lg_bpe_encode_batch.restype = ctypes.c_int64
        _lib = lib
    except Exception as e:  # noqa: BLE001 - any build/load failure -> numpy path
        print(f"lightgrad_tpu.native unavailable ({e}); using numpy fallbacks")
        _lib = False
    return _lib


def available() -> bool:
    return bool(_load())


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def u8_to_f32(src: np.ndarray, scale: float = 1.0 / 255.0) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(src, dtype=np.uint8)
    if not lib:
        return src.astype(np.float32) * scale
    out = np.empty(src.shape, dtype=np.float32)
    lib.lg_u8_to_f32(_ptr(src, ctypes.c_uint8), _ptr(out, ctypes.c_float),
                     src.size, ctypes.c_float(scale))
    return out


def shuffle_perm(n: int, seed: int) -> np.ndarray:
    lib = _load()
    if not lib:
        return np.random.default_rng(seed).permutation(n)
    out = np.empty(n, dtype=np.int64)
    lib.lg_shuffle_perm(_ptr(out, ctypes.c_int64), n, ctypes.c_uint64(seed))
    return out


def gather_rows(src: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Contiguous batch gather: rows src[idx] -> fresh (len(idx), ...)."""
    lib = _load()
    src = np.ascontiguousarray(src)
    if not lib:
        return src[idx]
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    out = np.empty((len(idx),) + src.shape[1:], dtype=src.dtype)
    row_bytes = src.dtype.itemsize * int(np.prod(src.shape[1:], dtype=np.int64))
    lib.lg_gather_rows(
        src.view(np.uint8).reshape(-1).ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _ptr(idx, ctypes.c_int64), len(idx), row_bytes,
        out.view(np.uint8).reshape(-1).ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out


def one_hot(labels: np.ndarray, num_classes: int) -> np.ndarray:
    lib = _load()
    labels = np.ascontiguousarray(labels, dtype=np.int32)
    if not lib:
        out = np.zeros((len(labels), num_classes), dtype=np.float32)
        out[np.arange(len(labels)), labels] = 1.0
        return out
    out = np.empty((len(labels), num_classes), dtype=np.float32)
    lib.lg_one_hot(_ptr(labels, ctypes.c_int32), _ptr(out, ctypes.c_float),
                   len(labels), num_classes)
    return out


def bpe_new(pair_a: np.ndarray, pair_b: np.ndarray,
            merged: np.ndarray) -> int:
    """Build a native BPE merge table (vocab-id pairs -> merged vocab id,
    rank = array index).  Returns a handle, or -1 when the native tier is
    unavailable (callers keep their Python merge loop as the fallback)."""
    lib = _load()
    if not lib:
        return -1
    pa = np.ascontiguousarray(pair_a, dtype=np.int32)
    pb = np.ascontiguousarray(pair_b, dtype=np.int32)
    mg = np.ascontiguousarray(merged, dtype=np.int32)
    return int(lib.lg_bpe_new(_ptr(pa, ctypes.c_int32),
                              _ptr(pb, ctypes.c_int32),
                              _ptr(mg, ctypes.c_int32), len(pa)))


def bpe_encode(handle: int, word: np.ndarray) -> np.ndarray:
    """Run the greedy merge loop on initial vocab-id symbols."""
    lib = _load()
    w = np.ascontiguousarray(word, dtype=np.int32)
    out = np.empty(len(w), dtype=np.int32)
    n = int(lib.lg_bpe_encode(ctypes.c_int64(handle),
                              _ptr(w, ctypes.c_int32), len(w),
                              _ptr(out, ctypes.c_int32)))
    assert n >= 0, "invalid native BPE handle"
    return out[:n]


def bpe_encode_batch(handle: int, flat: np.ndarray, offsets: np.ndarray):
    """Merge a flattened batch of words in one native call.

    ``flat``: all words' initial vocab ids concatenated; ``offsets``:
    (n_words+1,) int64 word boundaries.  Returns (merged_flat, counts)."""
    lib = _load()
    flat = np.ascontiguousarray(flat, dtype=np.int32)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    n_words = len(offsets) - 1
    out = np.empty(len(flat), dtype=np.int32)
    counts = np.empty(n_words, dtype=np.int64)
    total = int(lib.lg_bpe_encode_batch(
        ctypes.c_int64(handle), _ptr(flat, ctypes.c_int32),
        _ptr(offsets, ctypes.c_int64), n_words,
        _ptr(out, ctypes.c_int32), _ptr(counts, ctypes.c_int64)))
    assert total >= 0, "invalid native BPE handle"
    return out[:total], counts
