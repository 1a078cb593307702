"""SentencePiece reader + LLaMA tokenizer (utils/sentencepiece.py).

The parser is validated by round-tripping a synthetic vocabulary through the
ModelProto wire format; the BPE and unigram encoders against hand-computed
segmentations; byte fallback and decode against utf-8 round trips."""

import numpy as np
import pytest

from lightgrad_tpu.utils.sentencepiece import SentencePieceModel
from lightgrad_tpu.models import LlamaTokenizer

_SP = "▁"  # the sentencepiece space marker


def _toy_bpe():
    """LLaMA-style vocab: specials, byte pieces, then scored merges."""
    pieces = [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3)]
    pieces += [(f"<0x{b:02X}>", 0.0, 6) for b in range(256)]
    for i, (piece, score) in enumerate([
        (_SP, -1.0), ("h", -2.0), ("e", -2.1), ("l", -2.2), ("o", -2.3),
        ("he", -3.0), ("ll", -3.1), ("hell", -4.0), ("hello", -5.0),
        (_SP + "hello", -5.5), ("w", -2.4), ("or", -3.2), ("orl", -4.5),
        ("orld", -6.0), (_SP + "w", -3.5),
    ]):
        pieces.append((piece, score, 1))
    return SentencePieceModel(pieces, SentencePieceModel.BPE)


def test_proto_roundtrip():
    sp = _toy_bpe()
    sp2 = SentencePieceModel.from_bytes(sp.to_bytes())
    assert sp2.pieces == sp.pieces
    np.testing.assert_allclose(sp2.scores, sp.scores, rtol=1e-6)
    assert sp2.types == sp.types
    assert sp2.model_type == SentencePieceModel.BPE
    assert sp2.unk_id == 0


def test_bpe_merges_by_score():
    sp = _toy_bpe()
    # "hello": merges h+e (-3.0) and l+l (-3.1) first, then hell (-4.0),
    # hello (-5.0), then _+hello (-5.5) -> single piece
    ids = sp.encode("hello")
    assert [sp.pieces[i] for i in ids] == [_SP + "hello"]
    # "world": no 'world' piece; _w merges, 'orld' merges
    ids = sp.encode("world")
    assert [sp.pieces[i] for i in ids] == [_SP + "w", "orld"]


def test_byte_fallback():
    sp = _toy_bpe()
    ids = sp.encode("hé")  # é has no piece -> 2 utf-8 byte pieces
    pieces = [sp.pieces[i] for i in ids]
    assert pieces[0] == _SP  # dummy prefix space stays unmerged
    assert pieces[1] == "h"
    assert pieces[2:] == ["<0xC3>", "<0xA9>"]
    assert sp.decode(ids) == "hé"


def test_decode_roundtrip():
    sp = _toy_bpe()
    for text in ["hello world", "hello hello", "we"]:
        assert sp.decode(sp.encode(text)) == text


def test_unigram_viterbi():
    pieces = [("<unk>", 0.0, 2)]
    pieces += [(p, s, 1) for p, s in [
        (_SP, -1.0), ("a", -3.0), ("b", -3.0), ("ab", -4.0), ("ba", -7.0),
    ]]
    sp = SentencePieceModel(pieces, SentencePieceModel.UNIGRAM)
    # "abab": best is ab+ab (-8) over a+ba+b (-13) etc.
    ids = sp.encode("abab", add_prefix=False)
    assert [sp.pieces[i] for i in ids] == ["ab", "ab"]


def test_llama_tokenizer_bos_and_decode():
    tok = LlamaTokenizer(_toy_bpe())
    ids = tok.encode("hello")
    assert ids[0] == tok.bos_id
    assert tok.decode(ids) == "hello"
    assert tok.vocab_size == len(tok.sp)


def test_llama_tokenizer_from_file(tmp_path):
    sp = _toy_bpe()
    p = tmp_path / "tokenizer.model"
    p.write_bytes(sp.to_bytes())
    tok = LlamaTokenizer.from_file(str(p))
    assert tok.decode(tok.encode("hello world")) == "hello world"


@pytest.mark.skipif(
    not pytest.importorskip("transformers", reason="transformers absent"),
    reason="transformers absent")
def test_matches_hf_llama_tokenizer_if_cached():
    """When a real LLaMA tokenizer.model is available locally (no egress in
    CI), compare against transformers' slow tokenizer output."""
    import glob
    import os

    cands = glob.glob(os.path.expanduser(
        "~/.cache/huggingface/**/tokenizer.model"), recursive=True)
    if not cands:
        pytest.skip("no cached tokenizer.model")
    try:
        from transformers import LlamaTokenizer as HFTok

        hf = HFTok(cands[0], legacy=False)
    except Exception:
        pytest.skip("hf slow tokenizer unavailable (needs sentencepiece)")
    ours = LlamaTokenizer.from_file(cands[0])
    for text in ["hello world", "The quick brown fox", "a b  c"]:
        assert ours.encode(text) == hf.encode(text)
