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
    height_block: int = 0  # >0: execute the 3x3/5x5 convs height-repacked
    # (ops/depthblock.py) with per-conv block size min(this, 128/Cout,
    # pow2(H)) — exact, same params; the 8-32 channel trunk otherwise
    # runs the MXU at a few percent. 1x1 laterals stay plain (matmuls).

    @property
    def out_channels(self):
        b = self.base_channels
        if self.arch_mode == "fpn":
            return [4 * b, 2 * b, b][: self.num_stage]
        return [4 * b, 2 * b, b][: self.num_stage]

    def _hb(self, h_out: int, cout: int, h_base: int = 0):
        if not self.height_block or h_base % 4:
            # the trunk is stride-4: only when the input height is a
            # multiple of 4 are all level heights exact (h, h/2, h/4) and
            # every repack2d block guaranteed to divide its conv's actual
            # input height — otherwise fall back to the plain conv path
            # instead of tripping the repack2d assert at trace time
            return None
        from ..ops.depthblock import height_block
        bb = height_block(h_out, cout, self.height_block)
        return (bb, bb) if bb >= 2 else None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.arch_mode in ("fpn", "unet")
        b = self.base_channels
        h = x.shape[1]
        conv0 = Conv2dBlock(b, 3, 1, padding=1)(x, train, self._hb(h, b, h))
        conv0 = Conv2dBlock(b, 3, 1, padding=1)(conv0, train, self._hb(h, b, h))

        hb1 = self._hb(h // 2, 2 * b, h)
        conv1 = Conv2dBlock(2 * b, 5, 2, padding=2)(conv0, train, hb1)
        conv1 = Conv2dBlock(2 * b, 3, 1, padding=1)(conv1, train, hb1)
        conv1 = Conv2dBlock(2 * b, 3, 1, padding=1)(conv1, train, hb1)

        hb2 = self._hb(h // 4, 4 * b, h)
        conv2 = Conv2dBlock(4 * b, 5, 2, padding=2)(conv1, train, hb2)
        conv2 = Conv2dBlock(4 * b, 3, 1, padding=1)(conv2, train, hb2)
        conv2 = Conv2dBlock(4 * b, 3, 1, padding=1)(conv2, train, hb2)

        def head(feats, name, y):
            """3x3 bias-free head, height-repacked when enabled (XLA's
            plain lowering of narrow-Cout convs at full res is the same
            pathology as the U-Net's prob conv)."""
            conv = nn.Conv(feats, (3, 3), padding=1, use_bias=False,
                           dtype=get_compute_dtype(), name=name)
            hbH = self._hb(y.shape[1], feats, h)
            if hbH is None:
                return conv(y)
            from ..ops.depthblock import (conv2d_repacked, repack2d,
                                          unpack2d)
            _ = conv(y[:, :1, :1, :])  # bind params; dead code at run
            cdt = get_compute_dtype() or y.dtype  # match nn.Conv's cast:
            # feeding f32 features downstream forces the Pallas cost-volume
            # matmuls to f32/HIGHEST (measured 3.5x slower end to end)
            kern = conv.variables["params"]["kernel"].astype(cdt)
            return unpack2d(conv2d_repacked(
                repack2d(y.astype(cdt), hbH[0]), kern, block_in=hbH[0],
                block_out=hbH[1], stride=1, pad_w=1), hbH[1])

        intra = conv2
        outputs = {"stage1": nn.Conv(4 * b, (1, 1), use_bias=False, dtype=get_compute_dtype(), name="out1")(intra)}

        if self.arch_mode == "fpn":
            if self.num_stage >= 2:
                lateral1 = nn.Conv(4 * b, (1, 1), use_bias=True, dtype=get_compute_dtype(), name="inner1")(conv1)
                intra = resize_nearest(intra, conv1.shape[1:3]) + lateral1
                head2_ch = 2 * b if self.num_stage == 3 else b
                outputs["stage2"] = head(head2_ch, "out2", intra)
            if self.num_stage == 3:
                lateral2 = nn.Conv(4 * b, (1, 1), use_bias=True, dtype=get_compute_dtype(), name="inner2")(conv0)
                intra = resize_nearest(intra, conv0.shape[1:3]) + lateral2
                outputs["stage3"] = head(b, "out3", intra)
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
