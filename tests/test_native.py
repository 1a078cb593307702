"""Native (C++) data-loader core + DeviceDataset tests."""

import numpy as np
import pytest

from lightgrad_tpu import native


def test_native_builds():
    assert native.available(), "native library failed to build"


def test_u8_to_f32():
    src = np.random.randint(0, 256, (1000,), dtype=np.uint8)
    np.testing.assert_allclose(
        native.u8_to_f32(src), src.astype(np.float32) / 255.0, rtol=1e-7
    )


def test_shuffle_perm():
    p = native.shuffle_perm(1000, seed=42)
    assert sorted(p) == list(range(1000))
    p2 = native.shuffle_perm(1000, seed=42)
    np.testing.assert_array_equal(p, p2)  # deterministic
    assert not np.array_equal(p, np.arange(1000))


def test_gather_rows():
    src = np.random.rand(100, 7, 3).astype(np.float32)
    idx = np.random.randint(0, 100, 32)
    np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])


def test_one_hot():
    labels = np.array([0, 3, 9, 3], dtype=np.int32)
    out = native.one_hot(labels, 10)
    expect = np.zeros((4, 10), np.float32)
    expect[np.arange(4), labels] = 1
    np.testing.assert_array_equal(out, expect)


def test_dataset_native_shuffle_pairs_rows():
    import lightgrad_tpu as light
    from lightgrad_tpu.autograd import CpuTensor

    xs = np.arange(50, dtype=np.float32).reshape(50, 1)
    ds = light.data.Dataset(
        (CpuTensor.from_numpy(xs, requires_grad=False),
         CpuTensor.from_numpy(xs.squeeze(-1), requires_grad=False)),
        shuffle=True, batchsize=16,
    )
    seen = []
    for x, y in ds:
        np.testing.assert_array_equal(x.numpy().squeeze(-1), y.numpy())
        seen.extend(y.numpy().tolist())
    assert sorted(seen) == list(range(50))


def test_device_dataset():
    import lightgrad_tpu as light

    xs = np.arange(40, dtype=np.float32).reshape(20, 2)
    ys = np.arange(20, dtype=np.int32)
    ds = light.data.DeviceDataset((xs, ys), shuffle=False, batchsize=8)
    batches = list(ds)
    assert len(batches) == 2  # ragged tail dropped for constant shapes
    np.testing.assert_array_equal(batches[0][0].numpy(), xs[:8])
    np.testing.assert_array_equal(batches[1][1].numpy(), ys[8:16])
    # shuffled epoch keeps rows paired
    ds2 = light.data.DeviceDataset((xs, ys), shuffle=True, batchsize=8)
    for x, y in ds2:
        np.testing.assert_array_equal(x.numpy()[:, 0], 2 * y.numpy())


def test_lm_dataset_windows():
    import lightgrad_tpu as light

    toks = np.arange(100, dtype=np.int64)
    ds = light.data.LMDataset(toks, seq=8, shuffle=False, batchsize=4)
    xs, ys = ds.tensors
    # non-overlapping windows; targets are the next-token shift
    np.testing.assert_array_equal(xs.numpy()[0], np.arange(8))
    np.testing.assert_array_equal(ys.numpy()[0], np.arange(1, 9))
    np.testing.assert_array_equal(xs.numpy()[1], np.arange(8, 16))
    # every window's target == input shifted by one
    np.testing.assert_array_equal(ys.numpy()[:, :-1], xs.numpy()[:, 1:])

    # overlapping stride
    ds2 = light.data.LMDataset(toks, seq=8, stride=4, shuffle=False,
                               batchsize=4)
    np.testing.assert_array_equal(ds2.tensors[0].numpy()[1], np.arange(4, 12))

    # shuffle keeps (x, y) aligned; offsets() drive a jit step
    ds3 = light.data.LMDataset(toks, seq=8, shuffle=True, batchsize=4)
    xs3, ys3 = ds3.tensors
    total = 0
    step = light.jit(lambda off: (ys3.narrow(off, 4).astype("float32")
                                  - xs3.narrow(off, 4).astype("float32"))
                     .sum())
    for off in ds3.offsets():
        d = step(off)
        total += int(d.item())
        assert d.item() == 4 * 8  # shift-by-one everywhere, pairs aligned
    assert total == len(ds3) * 32


def _toy_tokenizer():
    """Synthetic byte-level-free BPE where every merge result is in-vocab."""
    from lightgrad_tpu.models import GPT2Tokenizer

    chars = list("abcdef ")
    vocab = {c: i for i, c in enumerate(chars)}
    merges = [("a", "b"), ("c", "d"), ("ab", "cd"), ("e", "f"),
              ("abcd", "ef")]
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    return GPT2Tokenizer(vocab, merges)


def test_native_bpe_matches_python_loop():
    """The C++ merge core produces exactly the Python _bpe pieces."""
    from lightgrad_tpu import native

    tok = _toy_tokenizer()
    words = ["abcdef", "fedcba", "aabbccddeeff", "abab", "a", "ef",
             "abcdefabcdef", "bdf"]
    for w in words:
        want = [tok.encoder[p] for p in tok._bpe(w)]
        tok._cache.clear()
        got = tok._encode_word(w)
        assert got == want, (w, got, want)
    if native.available():
        assert tok._native_handle >= 0  # the toy vocab qualifies


def test_native_bpe_overlapping_merge_order():
    """Left-to-right non-overlapping application of the best pair."""
    from lightgrad_tpu.models import GPT2Tokenizer

    vocab = {"a": 0, "aa": 1, "aaaa": 2}
    tok = GPT2Tokenizer(vocab, [("a", "a"), ("aa", "aa")])
    # "aaa" -> merge pair (a,a) left-to-right: [aa, a]; (aa,aa) not present
    assert tok._encode_word("aaa") == [1, 0]
    assert tok._encode_word("aaaa") == [2]
    assert tok._encode_word("aaaaa") == [2, 0]
