"""ViT parity vs HuggingFace transformers (CPU torch, no network).

Same protocol as tests/test_bert.py: random-init a small HF
ViTForImageClassification, serialize with torch.save, load through our
dependency-light reader + remap_hf_state, compare logits end to end
(patch-conv embedding, CLS/position embeddings, pre-LN encoder, head).
"""

import io

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import lightgrad_tpu as light
from lightgrad_tpu.autograd import TpuTensor
from lightgrad_tpu.models import ViTConfig, ViTForImageClassification


def _small_hf_model(num_labels=7):
    cfg = transformers.ViTConfig(
        image_size=32,
        patch_size=8,
        num_channels=3,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        hidden_act="gelu_new",  # tanh-approximated gelu, matching ours
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        num_labels=num_labels,
    )
    torch.manual_seed(0)
    return transformers.ViTForImageClassification(cfg).eval(), cfg


def _ours_from_hf(hf_model, hf_cfg):
    from lightgrad_tpu.utils import load_torch_state_dict

    buf = io.BytesIO()
    torch.save(hf_model.state_dict(), buf)
    state = load_torch_state_dict(buf.getvalue())

    cfg = ViTConfig(
        image_size=hf_cfg.image_size,
        patch_size=hf_cfg.patch_size,
        num_channels=hf_cfg.num_channels,
        hidden_size=hf_cfg.hidden_size,
        num_hidden_layers=hf_cfg.num_hidden_layers,
        num_attention_heads=hf_cfg.num_attention_heads,
        intermediate_size=hf_cfg.intermediate_size,
        layer_norm_eps=hf_cfg.layer_norm_eps,
        num_labels=hf_cfg.num_labels,
    )
    model = ViTForImageClassification(cfg)
    model.load_parameters(ViTForImageClassification.remap_hf_state(state))
    return model, cfg


def test_vit_matches_transformers():
    hf_model, hf_cfg = _small_hf_model()
    model, cfg = _ours_from_hf(hf_model, hf_cfg)

    rng = np.random.default_rng(2)
    pixels = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)

    with torch.no_grad():
        ref = hf_model(torch.tensor(pixels)).logits.numpy()

    ours = model(TpuTensor.from_numpy(pixels, requires_grad=False)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)
    assert (ours.argmax(-1) == ref.argmax(-1)).all()


def test_vit_trains():
    """Tiny ViT fits a 3-class synthetic problem (full train loop smoke)."""
    np.random.seed(0)
    cfg = ViTConfig(image_size=16, patch_size=4, num_channels=1,
                    hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=2, intermediate_size=64, num_labels=3)
    model = ViTForImageClassification(cfg)

    n = 24
    labels = np.arange(n) % 3
    pixels = np.zeros((n, 1, 16, 16), np.float32)
    for i, c in enumerate(labels):  # class-dependent quadrant brightness
        pixels[i, 0, : 8 * (c % 2 + 1), : 8 * (c // 2 + 1)] = 1.0
    pixels += np.random.uniform(-0.1, 0.1, pixels.shape).astype(np.float32)

    x = TpuTensor.from_numpy(pixels, requires_grad=False)
    y = TpuTensor.from_numpy(labels.astype(np.int32), requires_grad=False)
    opt = light.optim.Adam(model.parameters(), lr=3e-3)

    losses = []
    for _ in range(30):
        loss = light.loss.cross_entropy(model(x), y)
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(loss.item())
    assert losses[-1] < losses[0] * 0.5, losses[::5]


def test_vit_scan_layers_equivalent():
    """scan_layers=True runs the same math through one lax.scan."""
    np.random.seed(1)
    cfg = ViTConfig(image_size=16, patch_size=8, num_channels=3,
                    hidden_size=32, num_hidden_layers=3,
                    num_attention_heads=2, intermediate_size=64, num_labels=5)
    plain = ViTForImageClassification(cfg)

    cfg_s = ViTConfig(**{**cfg.__dict__, "scan_layers": True})
    scanned = ViTForImageClassification(cfg_s)
    scanned.load_parameters(plain.state_dict())

    pixels = TpuTensor.from_numpy(
        np.random.uniform(-1, 1, (2, 3, 16, 16)).astype(np.float32),
        requires_grad=False)
    np.testing.assert_allclose(scanned(pixels).numpy(), plain(pixels).numpy(),
                               rtol=2e-5, atol=2e-5)
