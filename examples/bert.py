"""BERT-base masked-LM on the TPU backend.

Parity workload: reference examples/bert.py (model, HF checkpoint loading,
WordPiece tokenizer, masked-token top-k prediction).  TPU-native differences:

* embeddings are a native gather (`nn.Embedding`) -- the reference round-
  tripped ids through the CPU per lookup (reference bert.py:19-21);
* inference runs under ``light.jit`` so the whole 12-layer forward is one XLA
  program;
* with no network (air-gapped pods) the example falls back to a random-
  initialized small config + synthetic vocab so the full path stays runnable.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import lightgrad_tpu as light
from lightgrad_tpu.models import BertConfig, BertForMaskedLM, BertTokenizer


def load_model_and_tokenizer(offline_layers=4, offline_hidden=256):
    try:
        model, cfg = BertForMaskedLM.from_pretrained()
        tok = BertTokenizer.from_pretrained()
        print("loaded bert-base-uncased from HuggingFace")
    except Exception as e:  # noqa: BLE001 - air-gapped fallback
        print(f"checkpoint unavailable ({e}); using random-init small config")
        np.random.seed(0)
        cfg = BertConfig(
            vocab_size=1000,
            hidden_size=offline_hidden,
            num_hidden_layers=offline_layers,
            num_attention_heads=offline_hidden // 64,
            intermediate_size=offline_hidden * 4,
        )
        model, tok = BertForMaskedLM(cfg), BertTokenizer.synthetic()
    return model, tok, cfg


def main(text="the capital of france is [MASK] .", topk=5):
    model, tok, cfg = load_model_and_tokenizer()
    model.map_parameters(lambda p: p.tpu())

    ids = tok.encode(text)
    mask_pos = ids.index(tok.ids["[MASK]"]) if tok.ids["[MASK]"] in ids else 1
    input_ids = light.Tensor.from_numpy(np.array([ids], dtype=np.int32), requires_grad=False)

    @light.jit
    def infer(x):
        with light.no_grad():
            return model(x)

    infer(input_ids)  # record
    infer(input_ids).numpy()  # compile
    t0 = time.perf_counter()
    logits = infer(input_ids)
    logits.numpy()
    lat = time.perf_counter() - t0
    row = logits.numpy()[0, mask_pos]
    top = np.argsort(-row)[:topk]
    print(f"inference latency {lat * 1e3:.2f} ms (seq {len(ids)}, {cfg.num_hidden_layers} layers)")
    print("top-k for [MASK]:", list(zip(tok.convert_ids_to_tokens(top), row[top].round(3))))
    return lat


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--text", default="the capital of france is [MASK] .")
    ap.add_argument("--topk", type=int, default=5)
    args = ap.parse_args()
    main(args.text, args.topk)
