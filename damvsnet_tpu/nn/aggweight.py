"""Per-view visibility weight net for adaptive cost aggregation.

Parity with AggWeightNetVolume (/root/reference/models/module.py:544-563):
w_net = Conv3d(C -> 1, 1x1x1, BN, ReLU) -> Conv3d(1 -> 1, 1x1x1, BN, ReLU),
applied to the squared feature difference volume. (The reference also
constructs an unused ``conv0``; it never participates in forward and is
omitted here.)
"""
from __future__ import annotations

import flax.linen as nn

from .blocks import Conv3dBlock


class AggWeightNetVolume(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, D, H, W, C] -> [B, D, H, W, 1] non-negative weights."""
        w = Conv3dBlock(1, kernel_size=1, stride=1, padding=0)(x, train)
        w = Conv3dBlock(1, kernel_size=1, stride=1, padding=0)(w, train)
        return w


class AggWeightNetVolume2(nn.Module):
    """AA-RMVSNet-style alternative weight net (reference kept it in-tree but
    found it no better; parity: models/module.py:567-591): 3x3x3 stem, tiny
    1x1x1 residual block, 1x1x1 head."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        stem = Conv3dBlock(1, kernel_size=3, stride=1, padding=1,
                           name="conv0")(x, train)
        out = Conv3dBlock(1, kernel_size=1, stride=1, padding=0,
                          name="res0")(stem, train)
        out = Conv3dBlock(1, kernel_size=1, stride=1, padding=0,
                          name="res1")(out, train)
        out = out + stem
        return Conv3dBlock(1, kernel_size=1, stride=1, padding=0,
                           name="conv1")(out, train)
