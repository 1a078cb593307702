"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device mesh"
)


@needs_mesh
def test_partition_rules():
    from lightgrad_tpu.parallel import partition_rules, BERT_TP_RULES
    from jax.sharding import PartitionSpec as P

    assert partition_rules(BERT_TP_RULES, "bert.layer.0.attention.self.query.weight") == P("tp", None)
    assert partition_rules(BERT_TP_RULES, "bert.layer.3.attention.dense.weight") == P(None, "tp")
    assert partition_rules(BERT_TP_RULES, "bert.layer.1.LayerNorm.weight") == P()
    assert partition_rules(BERT_TP_RULES, "decoder.weight") == P("tp", None)


@needs_mesh
def test_shard_module_places_params():
    from lightgrad_tpu import models, parallel

    cfg = models.BertConfig(vocab_size=128, hidden_size=32, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=64,
                            max_position_embeddings=16)
    np.random.seed(0)
    model = models.BertForMaskedLM(cfg)
    mesh = parallel.make_mesh(dp=2, tp=2)
    parallel.shard_module(model, mesh, parallel.BERT_TP_RULES)
    q = dict(model.named_parameters())["bert.layer.0.attention.self.query.weight"]
    # row-sharded over tp: each device holds half the output features
    shard_shapes = {s.data.shape for s in q.data.addressable_shards}
    assert shard_shapes == {(16, 32)}


@needs_mesh
def test_dryrun_multichip():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
