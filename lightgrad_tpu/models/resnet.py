"""ResNet vision family: residual conv blocks with BatchNorm.

Fourth model family beyond the reference's BERT example (and our GPT/LLaMA):
exercises the conv stack -- strided/grouped/dilated convs, BatchNorm running
stats, global average pooling -- at model level (ROADMAP 'Capability').
Default configs are the CIFAR-style ResNets from He et al. (depth 6n+2) plus
an ImageNet-style ResNet-18 layout.

The reference has a 3-layer CNN example only (reference examples/mnist.py:
12-22); residual vision models are an extension.
"""

import numpy as np

import lightgrad_tpu.nn as nn

__all__ = ["BasicBlock", "ResNet", "resnet20", "resnet18"]


class BasicBlock(nn.Module):
    """conv3x3-BN-relu-conv3x3-BN + skip (1x1-conv-BN projection when the
    shape changes)."""

    def __init__(self, in_ch: int, out_ch: int, stride: int = 1):
        super().__init__()
        self.c1 = nn.Conv2d(in_ch, out_ch, kernelsize=3, stride=stride,
                            pad=1, bias=False)
        self.b1 = nn.BatchNorm2d(out_ch)
        self.c2 = nn.Conv2d(out_ch, out_ch, kernelsize=3, stride=1, pad=1,
                            bias=False)
        self.b2 = nn.BatchNorm2d(out_ch)
        if stride != 1 or in_ch != out_ch:
            self.proj = nn.Conv2d(in_ch, out_ch, kernelsize=1, stride=stride,
                                  pad=0, bias=False)
            self.bproj = nn.BatchNorm2d(out_ch)
        else:
            self.proj = None

    def forward(self, x):
        y = self.b1(self.c1(x)).relu()
        y = self.b2(self.c2(y))
        skip = self.bproj(self.proj(x)) if self.proj is not None else x
        return (y + skip).relu()


class ResNet(nn.Module):
    """Residual network over (B, C, H, W) inputs.

    ``stage_blocks``: blocks per stage; ``stage_channels``: channel width per
    stage (stages after the first downsample with stride 2).  Classification
    head = global average pool + linear."""

    def __init__(self, stage_blocks, stage_channels, num_classes: int = 10,
                 in_channels: int = 3, stem_kernel: int = 3):
        super().__init__()
        c0 = stage_channels[0]
        self.stem = nn.Conv2d(in_channels, c0, kernelsize=stem_kernel,
                              stride=1, pad=stem_kernel // 2, bias=False)
        self.bstem = nn.BatchNorm2d(c0)
        blocks = []
        in_ch = c0
        for si, (n, ch) in enumerate(zip(stage_blocks, stage_channels)):
            for bi in range(n):
                stride = 2 if (si > 0 and bi == 0) else 1
                blocks.append(BasicBlock(in_ch, ch, stride=stride))
                in_ch = ch
        self.blocks = nn.ModuleList(*blocks)
        self.fc = nn.Linear(in_ch, num_classes)

    def forward(self, x):
        y = self.bstem(self.stem(x)).relu()
        for blk in self.blocks:
            y = blk(y)
        # global average pool over H, W
        y = y.mean(axis=(2, 3))
        return self.fc(y)


def resnet20(num_classes: int = 10, in_channels: int = 3) -> ResNet:
    """CIFAR ResNet-20 (He et al.: 3 stages x 3 blocks, 16/32/64 channels)."""
    return ResNet([3, 3, 3], [16, 32, 64], num_classes=num_classes,
                  in_channels=in_channels)


def resnet18(num_classes: int = 1000, in_channels: int = 3) -> ResNet:
    """ImageNet-style ResNet-18 layout (4 stages x 2 blocks, 64..512)."""
    return ResNet([2, 2, 2, 2], [64, 128, 256, 512],
                  num_classes=num_classes, in_channels=in_channels,
                  stem_kernel=7)
