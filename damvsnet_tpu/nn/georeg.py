"""GeoRegNet2d: prob-volume-embedding cost regularizer (GeoMVSNet style).

Parity with /root/reference/models/geometry.py:280-375 and
Reg_BasicBlockGeo (:549-593): (1,3,3)-kernel 3-D convs whose geo planes are
the depth-max-pooled previous-stage probability volume ("z" encoding); used
by the ``embedding_prob_volume`` cascade variant
(models/cas_mvsnet_embeddingProbVolme.py).

Layout: volumes NDHWC [B, D, H, W, C].
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .blocks import Conv3dBlock, Deconv3dBlock

_K = (1, 3, 3)
_P = (0, 1, 1)
_S = (1, 2, 2)


class RegBasicBlockGeo(nn.Module):
    """Reg_BasicBlockGeo (geometry.py:549-593): geo-concat residual block."""
    planes: int
    stride: tuple = 1

    @nn.compact
    def __call__(self, x, g1=None, g2=None, train: bool = False):
        inplanes = x.shape[-1]
        identity = x
        if g1 is not None:
            x = jnp.concatenate([x, g1], axis=-1)
        out = Conv3dBlock(self.planes, _K, 1, padding=_P, name="conv1")(x, train)
        if g2 is not None:
            out = jnp.concatenate([g2, out], axis=-1)
        out = Conv3dBlock(self.planes, _K, self.stride, padding=_P, relu=False,
                          name="conv2")(out, train)
        if self.stride != 1 or inplanes != self.planes:
            identity = Conv3dBlock(self.planes, _K, self.stride, padding=_P,
                                   relu=False, name="downsample")(x, train)
        return nn.relu(out + identity)


def _depth_pool(x):
    """Max-pool the depth axis by 2 (NDHWC)."""
    return nn.max_pool(x, (2, 1, 1), strides=(2, 1, 1))


def _spatial_pool(x):
    return nn.max_pool(x, (1, 2, 2), strides=(1, 2, 2))


class GeoRegNet2d(nn.Module):
    convolutional_layer_encoding: str = "z"  # std / z

    @nn.compact
    def __call__(self, x, stage_idx: int, prob_volume_last=None,
                 train: bool = False):
        """x: [B, D, H, W, C] cost volume; prob_volume_last: [B, D_prev, H, W]
        previous-stage probability volume (required for "z" at stage >= 1)."""
        if self.convolutional_layer_encoding == "z" and stage_idx >= 1:
            pv = prob_volume_last[..., None]  # [B, D_prev, H, W, 1]
            # align D_prev to this stage's D: one pool for stage2 (64->32),
            # two for stage3 (32->8 via 32->16->8) (geometry.py:343-349)
            if stage_idx == 1:
                geo_s1 = _depth_pool(pv)
            else:
                geo_s1 = _depth_pool(_depth_pool(pv))
            geo_s2 = _spatial_pool(geo_s1)
            geo_s3 = _spatial_pool(geo_s2)
        else:
            assert self.convolutional_layer_encoding == "std" or stage_idx == 0
            geo_s1 = geo_s2 = geo_s3 = None

        feature = Conv3dBlock(8, _K, 1, padding=_P, name="conv_init")(x, train)
        feature1 = RegBasicBlockGeo(16, _S, name="encoder_layer1")(feature, geo_s1, geo_s1, train)
        feature2 = RegBasicBlockGeo(32, 1, name="encoder_layer2")(feature1, geo_s2, geo_s2, train)
        feature3 = RegBasicBlockGeo(64, _S, name="encoder_layer3")(feature2, geo_s2, geo_s2, train)
        feature4 = RegBasicBlockGeo(128, 1, name="encoder_layer4")(feature3, geo_s3, geo_s3, train)
        feature5 = RegBasicBlockGeo(256, _S, name="encoder_layer5")(feature4, geo_s3, geo_s3, train)

        f4p = Deconv3dBlock(128, (1, 5, 5), _S, padding=(0, 2, 2),
                            output_padding=(0, 1, 1), name="decoder_layer4")(feature5, train) + feature4
        f3p = Deconv3dBlock(64, _K, 1, padding=_P, output_padding=0,
                            name="decoder_layer3")(f4p, train) + feature3
        f2p = Deconv3dBlock(32, (1, 5, 5), _S, padding=(0, 2, 2),
                            output_padding=(0, 1, 1), name="decoder_layer2")(f3p, train) + feature2
        f1p = Deconv3dBlock(16, _K, 1, padding=_P, output_padding=0,
                            name="decoder_layer1")(f2p, train) + feature1
        fp = Deconv3dBlock(8, (1, 5, 5), _S, padding=(0, 2, 2),
                           output_padding=(0, 1, 1), name="decoder_layer")(f1p, train) + feature
        out = Deconv3dBlock(1, _K, 1, padding=_P, output_padding=0,
                            name="prob")(fp, train)
        return out[..., 0]  # [B, D, H, W]
