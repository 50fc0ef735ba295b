"""Geometry-aware reference-feature fusion (GeoFeatureFusion).

Parity with /root/reference/models/geometry.py:14-277: at cascade stages 2/3
the reference view's FPN feature is replaced by the output of a two-branch
RGB+depth encoder-decoder conditioned on the previous stage's depth and
confidence. The "z" convolutional-layer encoding (the shipped default,
cas_mvsnet.py:169-170) concatenates sparse-max-pooled normalized depth as an
extra input plane at each encoder level; "uv"/"xyz"/"std" variants are kept
as config options. ``add_origin_feat_flag`` adds the original FPN feature
before the final smoothing conv.

Layout: NHWC. ``stage_idx`` is the cascade stage index (1 => producing the
stage-2 feature, 2 => stage-3), a static Python int.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .blocks import Conv2dBlock, Deconv2dBlock

_LARGE = 600.0


def sparse_downsample_close(d, mask):
    """Nearest-valid-depth 2x downsampling (geometry.py:443-455).

    d, mask: [B, H, W, 1]. Valid pixels win via max-pool of -(d + penalty).
    """
    encode_d = -(1.0 - mask) * _LARGE - d
    d_pooled = -nn.max_pool(encode_d, (2, 2), strides=(2, 2))
    mask_pooled = nn.max_pool(mask, (2, 2), strides=(2, 2))
    d_result = d_pooled - (1.0 - mask_pooled) * _LARGE
    return d_result, mask_pooled


def _coords_uv(b, h, w, dtype):
    """Normalized (u, v) coordinate planes in [-1, 1], [B, H, W, 2]."""
    u = jnp.linspace(-1.0, 1.0, w, dtype=dtype)[None, None, :, None]
    v = jnp.linspace(-1.0, 1.0, h, dtype=dtype)[None, :, None, None]
    uv = jnp.concatenate([
        jnp.broadcast_to(u, (b, h, w, 1)),
        jnp.broadcast_to(v, (b, h, w, 1)),
    ], axis=-1)
    return uv


class BasicBlockGeo(nn.Module):
    """ResNet basic block with geo-plane concat (geometry.py:381-430)."""
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, g1=None, g2=None, train: bool = False):
        inplanes = x.shape[-1]
        identity = x
        if g1 is not None:
            x = jnp.concatenate([x, g1], axis=-1)
        out = Conv2dBlock(self.planes, 3, self.stride, padding=1,
                          name="conv1")(x, train)
        if g2 is not None:
            out = jnp.concatenate([g2, out], axis=-1)
        out = Conv2dBlock(self.planes, 3, 1, padding=1, relu=False,
                          name="conv2")(out, train)
        if self.stride != 1 or inplanes != self.planes:
            identity = Conv2dBlock(self.planes, 1, self.stride, padding=0,
                                   relu=False, name="downsample")(x, train)
        return nn.relu(out + identity)


def _convbnrelu(features, k, s, p, name):
    return Conv2dBlock(features, k, s, padding=p, name=name)


def _deconvbnrelu(features, k, s, p, op, name):
    return Deconv2dBlock(features, k, s, padding=p, output_padding=op, name=name)


class GeoFeatureFusion(nn.Module):
    convolutional_layer_encoding: str = "z"  # std / uv / z / xyz
    mask_type: str = "basic"  # basic / mean
    add_origin_feat_flag: bool = True

    def setup(self):
        # rgb encoder
        self.rgb_conv_init = _convbnrelu(8, 5, 1, 2, "rgb_conv_init")
        self.rgb_encoder_layer1 = BasicBlockGeo(16, 2, name="rgb_encoder_layer1")
        self.rgb_encoder_layer2 = BasicBlockGeo(32, 1, name="rgb_encoder_layer2")
        self.rgb_encoder_layer3 = BasicBlockGeo(64, 2, name="rgb_encoder_layer3")
        self.rgb_encoder_layer4 = BasicBlockGeo(128, 1, name="rgb_encoder_layer4")
        self.rgb_encoder_layer5 = BasicBlockGeo(256, 2, name="rgb_encoder_layer5")
        # rgb decoder -> coarse 2-channel (depth, confidence)
        self.rgb_decoder_layer4 = _deconvbnrelu(128, 5, 2, 2, 1, "rgb_decoder_layer4")
        self.rgb_decoder_layer2 = _deconvbnrelu(32, 5, 2, 2, 1, "rgb_decoder_layer2")
        self.rgb_decoder_layer0 = _deconvbnrelu(16, 3, 1, 1, 0, "rgb_decoder_layer0")
        self.rgb_decoder_layer = _deconvbnrelu(8, 5, 2, 2, 1, "rgb_decoder_layer")
        self.rgb_decoder_output = _deconvbnrelu(2, 3, 1, 1, 0, "rgb_decoder_output")
        # depth encoder
        self.depth_conv_init = _convbnrelu(8, 5, 1, 2, "depth_conv_init")
        self.depth_layer1 = BasicBlockGeo(16, 2, name="depth_layer1")
        self.depth_layer2 = BasicBlockGeo(32, 1, name="depth_layer2")
        self.depth_layer3 = BasicBlockGeo(64, 2, name="depth_layer3")
        self.depth_layer4 = BasicBlockGeo(128, 1, name="depth_layer4")
        self.depth_layer5 = BasicBlockGeo(256, 2, name="depth_layer5")
        # fused decoder
        self.decoder_layer3 = _deconvbnrelu(128, 5, 2, 2, 1, "decoder_layer3")
        self.decoder_layer4 = _deconvbnrelu(64, 3, 1, 1, 0, "decoder_layer4")
        self.decoder_layer5 = _deconvbnrelu(32, 5, 2, 2, 1, "decoder_layer5")
        self.decoder_layer6 = _deconvbnrelu(16, 3, 1, 1, 0, "decoder_layer6")
        self.decoder_layer7 = _deconvbnrelu(8, 5, 2, 2, 1, "decoder_layer7")
        # per-stage output heads
        self.rgbdepth_decoder_stage1 = _deconvbnrelu(32, 5, 2, 2, 1, "rgbdepth_decoder_stage1")
        self.rgbdepth_decoder_stage2 = _deconvbnrelu(16, 5, 2, 2, 1, "rgbdepth_decoder_stage2")
        self.rgbdepth_decoder_stage3 = _deconvbnrelu(8, 3, 1, 1, 0, "rgbdepth_decoder_stage3")
        self.final_decoder_stage1 = _deconvbnrelu(32, 3, 1, 1, 0, "final_decoder_stage1")
        self.final_decoder_stage2 = _deconvbnrelu(16, 3, 1, 1, 0, "final_decoder_stage2")
        self.final_decoder_stage3 = _deconvbnrelu(8, 3, 1, 1, 0, "final_decoder_stage3")

    def _geo_planes(self, rgb, d, valid_mask, intrinsics):
        """Per-level geometry planes (geo_s1..geo_s4) for the chosen encoding."""
        enc = self.convolutional_layer_encoding
        if enc == "std":
            return None, None, None, None
        if enc == "z":
            d_s2, vm_s2 = sparse_downsample_close(d, valid_mask)
            d_s3, vm_s3 = sparse_downsample_close(d_s2, vm_s2)
            d_s4, _ = sparse_downsample_close(d_s3, vm_s3)
            return d, d_s2, d_s3, d_s4
        b, h, w, _ = rgb.shape
        uv1 = _coords_uv(b, h, w, rgb.dtype)
        uv2 = nn.avg_pool(uv1, (2, 2), strides=(2, 2))
        uv3 = nn.avg_pool(uv2, (2, 2), strides=(2, 2))
        uv4 = nn.avg_pool(uv3, (2, 2), strides=(2, 2))
        if enc == "uv":
            return uv1, uv2, uv3, uv4
        if enc == "xyz":
            d_s2, vm_s2 = sparse_downsample_close(d, valid_mask)
            d_s3, vm_s3 = sparse_downsample_close(d_s2, vm_s2)
            d_s4, _ = sparse_downsample_close(d_s3, vm_s3)
            k = intrinsics
            fx = k[:, 0, 0][:, None, None, None]
            fy = k[:, 1, 1][:, None, None, None]
            cx = k[:, 0, 2][:, None, None, None]
            cy = k[:, 1, 2][:, None, None, None]

            def xyz(dz, uv, hh, ww):
                u, v = uv[..., 0:1], uv[..., 1:2]
                x = dz * (0.5 * ww * (u + 1) - cx) / fx
                y = dz * (0.5 * hh * (v + 1) - cy) / fy
                return jnp.concatenate([x, y, dz], axis=-1)

            return (xyz(d, uv1, h, w), xyz(d_s2, uv2, h / 2, w / 2),
                    xyz(d_s3, uv3, h / 4, w / 4), xyz(d_s4, uv4, h / 8, w / 8))
        raise ValueError(enc)

    def __call__(self, rgb, depth, confidence, depth_values, stage_idx,
                 origin_feat, intrinsics=None, train: bool = False):
        """rgb [B,H,W,3]; depth/confidence [B,H,W,1] (prev stage, upsampled x2);
        depth_values [B,D0]; origin_feat [B,H,W,C_stage]. Returns the fused
        replacement for the reference view's stage feature."""
        dmin = depth_values[:, 0][:, None, None, None]
        dmax = depth_values[:, -1][:, None, None, None]
        d = (depth - dmin) / (dmax - dmin)
        if self.mask_type == "basic":
            valid_mask = (d > 0).astype(d.dtype)
        else:  # "mean"
            conf_mean = jnp.mean(confidence, axis=(1, 2, 3), keepdims=True)
            valid_mask = ((d > 0) & (confidence > conf_mean)).astype(d.dtype)

        geo_s1, geo_s2, geo_s3, geo_s4 = self._geo_planes(rgb, d, valid_mask, intrinsics)

        # ---------------- rgb branch ----------------
        rgb_feature = self.rgb_conv_init(jnp.concatenate([rgb, d], axis=-1), train)
        rgb_feature1 = self.rgb_encoder_layer1(rgb_feature, geo_s1, geo_s2, train)
        rgb_feature2 = self.rgb_encoder_layer2(rgb_feature1, geo_s2, geo_s2, train)
        rgb_feature3 = self.rgb_encoder_layer3(rgb_feature2, geo_s2, geo_s3, train)
        rgb_feature4 = self.rgb_encoder_layer4(rgb_feature3, geo_s3, geo_s3, train)
        rgb_feature5 = self.rgb_encoder_layer5(rgb_feature4, geo_s3, geo_s4, train)

        rgb_feature4_plus = self.rgb_decoder_layer4(rgb_feature5, train) + rgb_feature4
        rgb_feature2_plus = self.rgb_decoder_layer2(rgb_feature4_plus, train) + rgb_feature2
        rgb_feature0_plus = self.rgb_decoder_layer0(rgb_feature2_plus, train) + rgb_feature1
        rgb_feature_plus = self.rgb_decoder_layer(rgb_feature0_plus, train) + rgb_feature
        rgb_output = self.rgb_decoder_output(rgb_feature_plus, train)
        rgb_depth = rgb_output[..., 0:1]

        # ---------------- depth branch ----------------
        sparsed_feature = self.depth_conv_init(
            jnp.concatenate([d, rgb_depth], axis=-1), train)
        sparsed_feature1 = self.depth_layer1(sparsed_feature, geo_s1, geo_s2, train)
        sparsed_feature2 = self.depth_layer2(sparsed_feature1, geo_s2, geo_s2, train)
        sparsed_feature2_plus = jnp.concatenate(
            [rgb_feature2_plus, sparsed_feature2], axis=-1)
        sparsed_feature3 = self.depth_layer3(sparsed_feature2_plus, geo_s2, geo_s3, train)
        sparsed_feature4 = self.depth_layer4(sparsed_feature3, geo_s3, geo_s3, train)
        sparsed_feature4_plus = jnp.concatenate(
            [rgb_feature4_plus, sparsed_feature4], axis=-1)
        sparsed_feature5 = self.depth_layer5(sparsed_feature4_plus, geo_s3, geo_s4, train)

        # ---------------- fused decoder ----------------
        fusion3 = rgb_feature5 + sparsed_feature5
        decoder_feature3 = self.decoder_layer3(fusion3, train)
        fusion4 = sparsed_feature4 + decoder_feature3
        decoder_feature4 = self.decoder_layer4(fusion4, train)

        final_feature = None
        if stage_idx >= 1:
            decoder_feature5 = self.decoder_layer5(decoder_feature4, train)
            decoder_feature6 = self.decoder_layer6(decoder_feature5, train)
            if stage_idx == 1:
                fusion6 = sparsed_feature1 + decoder_feature6
                rgbdepth_feature = self.rgbdepth_decoder_stage2(fusion6, train)
                if self.add_origin_feat_flag:
                    rgbdepth_feature = rgbdepth_feature + origin_feat
                final_feature = self.final_decoder_stage2(rgbdepth_feature, train)
        if stage_idx >= 2:
            decoder_feature7 = self.decoder_layer7(decoder_feature6, train)
            fusion7 = sparsed_feature + decoder_feature7
            rgbdepth_feature = self.rgbdepth_decoder_stage3(fusion7, train)
            if self.add_origin_feat_flag:
                rgbdepth_feature = rgbdepth_feature + origin_feat
            final_feature = self.final_decoder_stage3(rgbdepth_feature, train)

        return final_feature
