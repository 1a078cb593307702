from .mesh import make_mesh
from .shard import shard_module, shard_tensor, partition_rules, BERT_TP_RULES, MOE_EP_RULES
from .pipeline import pipeline_apply
