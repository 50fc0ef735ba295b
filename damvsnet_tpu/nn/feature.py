"""Multi-stage image feature extractor (FPN / UNet arch modes).

Parity with the reference FeatureNet (/root/reference/models/module.py:355-462):
stride-4 trunk 8 -> 16 -> 32 channels (k3/k5-s2/k5-s2 stacks), then either an
FPN top-down pathway (1x1 laterals + nearest x2 upsample, 3x3 heads) or a
UNet decoder (DeConv2dFuse). Outputs::

    {"stage1": [B, H/4, W/4, 4b], "stage2": [B, H/2, W/2, 2b], "stage3": [B, H, W, b]}
"""
from __future__ import annotations

import flax.linen as nn

from .precision import get_compute_dtype
import jax.numpy as jnp

from ..ops.resize import resize_nearest
from .blocks import Conv2dBlock, Deconv2dBlock


class DeConv2dFuse(nn.Module):
    """Deconv x2 + skip-concat + conv (parity: models/module.py:334-352)."""
    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x_pre, x, train: bool = False):
        x = Deconv2dBlock(self.features, self.kernel_size, stride=2, padding=1,
                          output_padding=1)(x, train)
        x = jnp.concatenate([x, x_pre], axis=-1)
        x = Conv2dBlock(self.features, self.kernel_size, stride=1, padding=1)(x, train)
        return x


class FeatureNet(nn.Module):
    base_channels: int = 8
    num_stage: int = 3
    arch_mode: str = "fpn"

    @property
    def out_channels(self):
        b = self.base_channels
        if self.arch_mode == "fpn":
            return [4 * b, 2 * b, b][: self.num_stage]
        return [4 * b, 2 * b, b][: self.num_stage]

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.arch_mode in ("fpn", "unet")
        b = self.base_channels
        conv0 = Conv2dBlock(b, 3, 1, padding=1)(x, train)
        conv0 = Conv2dBlock(b, 3, 1, padding=1)(conv0, train)

        conv1 = Conv2dBlock(2 * b, 5, 2, padding=2)(conv0, train)
        conv1 = Conv2dBlock(2 * b, 3, 1, padding=1)(conv1, train)
        conv1 = Conv2dBlock(2 * b, 3, 1, padding=1)(conv1, train)

        conv2 = Conv2dBlock(4 * b, 5, 2, padding=2)(conv1, train)
        conv2 = Conv2dBlock(4 * b, 3, 1, padding=1)(conv2, train)
        conv2 = Conv2dBlock(4 * b, 3, 1, padding=1)(conv2, train)

        intra = conv2
        outputs = {"stage1": nn.Conv(4 * b, (1, 1), use_bias=False, dtype=get_compute_dtype(), name="out1")(intra)}

        if self.arch_mode == "fpn":
            if self.num_stage >= 2:
                lateral1 = nn.Conv(4 * b, (1, 1), use_bias=True, dtype=get_compute_dtype(), name="inner1")(conv1)
                intra = resize_nearest(intra, conv1.shape[1:3]) + lateral1
                head2_ch = 2 * b if self.num_stage == 3 else b
                outputs["stage2"] = nn.Conv(head2_ch, (3, 3), padding=1,
                                            use_bias=False,
                                            dtype=get_compute_dtype(),
                                            name="out2")(intra)
            if self.num_stage == 3:
                lateral2 = nn.Conv(4 * b, (1, 1), use_bias=True, dtype=get_compute_dtype(), name="inner2")(conv0)
                intra = resize_nearest(intra, conv0.shape[1:3]) + lateral2
                outputs["stage3"] = nn.Conv(b, (3, 3), padding=1,
                                            use_bias=False,
                                            dtype=get_compute_dtype(),
                                            name="out3")(intra)
        else:  # unet
            if self.num_stage >= 2:
                intra = DeConv2dFuse(2 * b, name="deconv1")(conv1, intra, train)
                head2_ch = 2 * b if self.num_stage == 3 else b
                outputs["stage2"] = nn.Conv(head2_ch, (1, 1), use_bias=False,
                                            name="out2")(intra)
            if self.num_stage == 3:
                intra = DeConv2dFuse(b, name="deconv2")(conv0, intra, train)
                outputs["stage3"] = nn.Conv(b, (1, 1), use_bias=False,
                                            name="out3")(intra)
        return outputs
