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
