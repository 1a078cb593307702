"""Vision Transformer (ViT) family: config, encoder, classification head.

No reference counterpart (ndoll1998/lightgrad's vision story is the MNIST
CNN example, examples/mnist.py); added as the vision-transformer member of
the model zoo next to BERT/GPT/LLaMA/ResNet.  Architecture and parameter
naming follow HuggingFace ``google/vit-base-patch16-224`` so checkpoints
import through ``remap_hf_state`` exactly like the language families.

TPU-native details: patch embedding is a stride-P conv (one implicit GEMM
over the MXU), the encoder reuses the fused-attention ``BertSelfAttention``
(flash kernels at long patch counts), blocks are pre-LN, and
``scan_layers=True`` compiles the stack as one ``lax.scan``.
"""

import json

import numpy as np

import lightgrad_tpu.nn as nn
from lightgrad_tpu.autograd import Tensor

from .bert import BertSelfAttention

__all__ = ["ViTConfig", "ViTModel", "ViTForImageClassification"]


class ViTConfig:
    def __init__(self, image_size=224, patch_size=16, num_channels=3,
                 hidden_size=768, num_hidden_layers=12,
                 num_attention_heads=12, intermediate_size=3072,
                 layer_norm_eps=1e-12, num_labels=1000,
                 scan_layers=False, remat=False, **unused):
        assert image_size % patch_size == 0, (image_size, patch_size)
        self.image_size = image_size
        self.patch_size = patch_size
        self.num_channels = num_channels
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.layer_norm_eps = layer_norm_eps
        self.num_labels = num_labels
        self.scan_layers = scan_layers
        self.remat = remat
        self.num_patches = (image_size // patch_size) ** 2


class ViTEmbeddings(nn.Module):
    """Patchify + linear projection + [CLS] + learned position embeddings."""

    def __init__(self, cfg: ViTConfig):
        super().__init__()
        h, n = cfg.hidden_size, cfg.num_patches
        self.cls_token = Tensor.from_numpy(
            np.zeros((1, 1, h), np.float32))
        self.position_embeddings = Tensor.from_numpy(
            (np.random.uniform(-1, 1, (1, n + 1, h)) * 0.02).astype(np.float32))
        self.projection = nn.Conv2d(cfg.num_channels, h,
                                    kernelsize=cfg.patch_size,
                                    stride=cfg.patch_size, pad=0)

    def forward(self, pixels):
        b = pixels.shape[0]
        x = self.projection(pixels)                # (b, h, H/P, W/P)
        bh, hh, gh, gw = x.shape
        x = x.reshape(bh, hh, gh * gw).transpose(0, 2, 1)  # (b, n, h)
        # broadcast the CLS token over the batch: add-with-zeros is the
        # differentiable expand (unbroadcast sums the grad back)
        cls = self.cls_token + type(x).zeros((b, 1, x.shape[-1]),
                                             requires_grad=False)
        x = cls.concat(x, axis=1)
        return x + self.position_embeddings


class ViTLayer(nn.Module):
    """Pre-LN encoder block (ViT uses pre-norm, unlike BERT's post-norm)."""

    def __init__(self, cfg: ViTConfig):
        super().__init__()
        self.layernorm_before = nn.LayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps)
        self.attention = BertSelfAttention(cfg)
        self.attn_output = nn.Linear(cfg.hidden_size, cfg.hidden_size)
        self.layernorm_after = nn.LayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps)
        self.intermediate = nn.Linear(cfg.hidden_size, cfg.intermediate_size)
        self.output = nn.Linear(cfg.intermediate_size, cfg.hidden_size)

    def forward(self, x):
        x = x + self.attn_output(self.attention(self.layernorm_before(x)))
        return x + self.output(self.intermediate(self.layernorm_after(x)).gelu())


class ViTModel(nn.Module):
    def __init__(self, cfg: ViTConfig):
        super().__init__()
        self.cfg = cfg
        self.embeddings = ViTEmbeddings(cfg)
        blocks = [ViTLayer(cfg) for _ in range(cfg.num_hidden_layers)]
        if cfg.scan_layers:
            from lightgrad_tpu.scan import ScannedStack

            self.layer = ScannedStack(blocks, remat=cfg.remat)
        else:
            self.layer = nn.ModuleList(*blocks)
        self.layernorm = nn.LayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps)

    def forward(self, pixels):
        x = self.embeddings(pixels)
        if isinstance(self.layer, nn.ModuleList):
            for layer in self.layer:
                x = layer(x)
        else:
            x = self.layer(x)
        return self.layernorm(x)


class ViTForImageClassification(nn.Module):
    def __init__(self, cfg: ViTConfig):
        super().__init__()
        self.cfg = cfg
        self.vit = ViTModel(cfg)
        self.classifier = nn.Linear(cfg.hidden_size, cfg.num_labels)

    def forward(self, pixels):
        x = self.vit(pixels)             # (b, n+1, h)
        return self.classifier(x[:, 0])  # logits from the CLS position

    @staticmethod
    def remap_hf_state(state: dict) -> dict:
        """HuggingFace ViTForImageClassification names -> ours.

        HF nests self-attention as ``attention.attention.{query,key,value}``
        and its projection as ``attention.output.dense``; patch embedding is
        ``embeddings.patch_embeddings.projection``.
        """
        out = {}
        for hf_name, arr in state.items():
            name = hf_name
            name = name.replace("vit.encoder.layer.", "vit.layer.")
            name = name.replace(".attention.attention.", ".attention.")
            name = name.replace(".attention.output.dense.", ".attn_output.")
            name = name.replace(".intermediate.dense.", ".intermediate.")
            name = name.replace(".output.dense.", ".output.")
            # our Conv2d names its parameters w/b (bias stored (1, out, 1, 1))
            if name == "vit.embeddings.patch_embeddings.projection.weight":
                name = "vit.embeddings.projection.w"
            elif name == "vit.embeddings.patch_embeddings.projection.bias":
                name = "vit.embeddings.projection.b"
                arr = np.asarray(arr).reshape(1, -1, 1, 1)
            out[name] = arr
        return {k: v for k, v in out.items() if not k.startswith("vit.pooler.")}

    @staticmethod
    def from_pretrained(name: str = "google/vit-base-patch16-224"):
        from lightgrad_tpu.utils import fetch, load_torch_state_dict

        url = f"https://huggingface.co/{name}/resolve/main/"
        hf_cfg = json.loads(fetch(url + "config.json"))
        cfg = ViTConfig(num_labels=len(hf_cfg.get("id2label", [])) or 1000,
                        **hf_cfg)
        model = ViTForImageClassification(cfg)
        state = load_torch_state_dict(fetch(url + "pytorch_model.bin"))
        model.load_parameters(ViTForImageClassification.remap_hf_state(state))
        return model, cfg
