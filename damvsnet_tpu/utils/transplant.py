"""Torch-checkpoint -> Flax transplant for CascadeMVSNet.

Maps a reference DA-MVSNet state_dict (/root/reference/models/cas_mvsnet.py,
the shipped fpn / adaptive / GeoFusion configuration) onto this package's
CascadeMVSNet variables, enabling (a) full-model numerical parity tests
against the live reference and (b) reuse of reference-trained checkpoints.

Key layout conversions (torch -> flax):
  Conv2d  weight [O, I, kh, kw]        -> kernel [kh, kw, I, O]
  Conv3d  weight [O, I, kd, kh, kw]    -> kernel [kd, kh, kw, I, O]
  ConvT2d weight [I, O, kh, kw]        -> kernel [kh, kw, I, O]
  ConvT3d weight [I, O, kd, kh, kw]    -> kernel [kd, kh, kw, I, O]
  BatchNorm weight/bias                -> params  scale/bias
  BatchNorm running_mean/var           -> batch_stats mean/var

Name correspondences (reference -> ours):
  feature.conv{0,1,2}.{j} (Conv2d blocks)   -> feature.Conv2dBlock_{0..7}
  feature.{out1,inner1,out2,inner2,out3}    -> same names
  GeoFeatureFusionNet.<layer>               -> geo_fusion.<layer>
    convbnrelu/deconvbnrelu Sequential .0/.1 -> Conv_0|kernel / _NormAct_0
    BasicBlockGeo conv1+bn1 / conv2+bn2 /
    downsample.{0,1}                        -> conv1 / conv2 / downsample
  cost_regularization.{i}.conv{0..6}        -> cost_reg_stage{i+1}.Conv3dBlock_{0..6}
  cost_regularization.{i}.conv{7,9,11}      -> ....Deconv3dBlock_{0,1,2}
  cost_regularization.{i}.prob              -> ....prob
  DepthNet.weight_net.{i}.w_net.{0,1}       -> agg_weight_stage{i+1}.Conv3dBlock_{0,1}
  (DepthNet.weight_net.{i}.conv0 is dead code in the reference and skipped)
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


class _Tree:
    """Builder for the nested params/batch_stats dicts."""

    def __init__(self, sd, ignore_missing=False):
        self.sd = {k: v for k, v in sd.items()}
        self.params: dict = {}
        self.stats: dict = {}
        self.used = set()
        self.ignore_missing = ignore_missing

    def _get(self, key):
        self.used.add(key)
        return _np(self.sd[key])

    def _set(self, tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(value)

    def conv(self, tkey, path, perm, bias=False):
        """Plain conv: tkey+'.weight' -> path/kernel (+ optional bias)."""
        self._set(self.params, path + ("kernel",), self._get(tkey + ".weight").transpose(perm))
        if bias:
            self._set(self.params, path + ("bias",), self._get(tkey + ".bias"))

    def bn(self, tkey, path):
        """BatchNorm: params scale/bias + batch_stats mean/var."""
        self._set(self.params, path + ("scale",), self._get(tkey + ".weight"))
        self._set(self.params, path + ("bias",), self._get(tkey + ".bias"))
        self._set(self.stats, path + ("mean",), self._get(tkey + ".running_mean"))
        self._set(self.stats, path + ("var",), self._get(tkey + ".running_var"))
        self.used.add(tkey + ".num_batches_tracked")

    def block2d(self, tkey, path):
        """Reference Conv2d block (.conv + .bn) -> Conv2dBlock."""
        self.conv(tkey + ".conv", path + ("Conv_0",), (2, 3, 1, 0))
        self.bn(tkey + ".bn", path + ("_NormAct_0", "BatchNorm_0"))

    def block3d(self, tkey, path):
        """Reference Conv3d block (.conv + .bn) -> Conv3dBlock."""
        self.conv(tkey + ".conv", path + ("Conv_0",), (2, 3, 4, 1, 0))
        self.bn(tkey + ".bn", path + ("_NormAct_0", "BatchNorm_0"))

    def deconv_block3d(self, tkey, path):
        """Reference Deconv3d block (.conv ConvT3d + .bn) -> Deconv3dBlock."""
        self._set(self.params, path + ("kernel",),
                  self._get(tkey + ".conv.weight").transpose(2, 3, 4, 0, 1))
        self.bn(tkey + ".bn", path + ("_NormAct_0", "BatchNorm_0"))

    def seq_convbn(self, tkey, path):
        """geometry.py convbnrelu Sequential (.0 conv + .1 bn) -> Conv2dBlock."""
        self.conv(tkey + ".0", path + ("Conv_0",), (2, 3, 1, 0))
        self.bn(tkey + ".1", path + ("_NormAct_0", "BatchNorm_0"))

    def seq_deconvbn(self, tkey, path):
        """geometry.py deconvbnrelu Sequential (.0 ConvT2d + .1 bn) -> Deconv2dBlock."""
        self._set(self.params, path + ("kernel",),
                  self._get(tkey + ".0.weight").transpose(2, 3, 0, 1))
        self.bn(tkey + ".1", path + ("_NormAct_0", "BatchNorm_0"))

    def basic_block_geo(self, tkey, path, downsample=True):
        """BasicBlockGeo: conv1/bn1, conv2/bn2, optional downsample."""
        self.conv(tkey + ".conv1", path + ("conv1", "Conv_0"), (2, 3, 1, 0))
        self.bn(tkey + ".bn1", path + ("conv1", "_NormAct_0", "BatchNorm_0"))
        self.conv(tkey + ".conv2", path + ("conv2", "Conv_0"), (2, 3, 1, 0))
        self.bn(tkey + ".bn2", path + ("conv2", "_NormAct_0", "BatchNorm_0"))
        if downsample:
            self.conv(tkey + ".downsample.0", path + ("downsample", "Conv_0"),
                      (2, 3, 1, 0))
            self.bn(tkey + ".downsample.1",
                    path + ("downsample", "_NormAct_0", "BatchNorm_0"))


def _map_fmt_pathway(t: "_Tree", tprefix: str, path: tuple):
    """FMT_with_pathway (/root/reference/models/FMT.py:178-225) -> our
    FMTWithPathway (nn/fmt.py). Torch Linear weight [O, I] -> Dense kernel
    [I, O]; LayerNorm weight -> scale. The sine positional encoding is a
    non-persistent buffer (position_encoding.py:53) — nothing to map."""

    def dense(tkey, p):
        t._set(t.params, p + ("kernel",), t._get(tkey + ".weight").T)
        t._set(t.params, p + ("bias",), t._get(tkey + ".bias"))

    def layernorm(tkey, p):
        t._set(t.params, p + ("scale",), t._get(tkey + ".weight"))
        t._set(t.params, p + ("bias",), t._get(tkey + ".bias"))

    for i in range(8):  # layer_names = ['self', 'cross'] * 4
        rl = f"{tprefix}FMT.layers.{i}"
        ol = path + ("fmt", f"layer{i}")
        for proj in ("query_projection", "key_projection",
                     "value_projection", "out_projection"):
            dense(f"{rl}.attention.{proj}", ol + ("AttentionLayer_0", proj))
        dense(f"{rl}.linear1", ol + ("linear1",))
        dense(f"{rl}.linear2", ol + ("linear2",))
        layernorm(f"{rl}.norm1", ol + ("norm1",))
        layernorm(f"{rl}.norm2", ol + ("norm2",))
    for name in ("dim_reduction_1", "dim_reduction_2", "smooth_1", "smooth_2"):
        t.conv(f"{tprefix}{name}", path + (name,), (2, 3, 1, 0))


def transplant_fmt_pathway(state_dict):
    """Convert a standalone reference FMT_with_pathway state_dict to Flax
    variables for nn.fmt.FMTWithPathway."""
    sd = {k.removeprefix("module."): v for k, v in state_dict.items()}
    t = _Tree(sd)
    _map_fmt_pathway(t, "", ())
    unused = sorted(set(sd) - t.used)
    if unused:
        raise ValueError(f"unmapped reference keys ({len(unused)}): "
                         f"{unused[:8]}...")
    return {"params": t.params}


def transplant_cascade(state_dict, num_stage: int = 3,
                       use_geo_fusion: bool = True,
                       agg_mode: str = "adaptive",
                       use_fmt: bool = False):
    """Convert a reference CascadeMVSNet state_dict to Flax variables.

    Returns {"params": ..., "batch_stats": ...} ready for
    ``CascadeMVSNet.apply`` (fpn arch, share_cr=False, refine=False).
    Unknown keys are reported so silent drift is impossible.
    """
    sd = {k.removeprefix("module."): v for k, v in state_dict.items()}
    t = _Tree(sd)

    # ---- FeatureNet: 2+3+3 Conv2d blocks + FPN heads ----
    blocks = [("conv0", 2), ("conv1", 3), ("conv2", 3)]
    idx = 0
    for name, n in blocks:
        for j in range(n):
            t.block2d(f"feature.{name}.{j}", ("feature", f"Conv2dBlock_{idx}"))
            idx += 1
    t.conv("feature.out1", ("feature", "out1"), (2, 3, 1, 0))
    if num_stage >= 2:
        t.conv("feature.inner1", ("feature", "inner1"), (2, 3, 1, 0), bias=True)
        t.conv("feature.out2", ("feature", "out2"), (2, 3, 1, 0))
    if num_stage == 3:
        t.conv("feature.inner2", ("feature", "inner2"), (2, 3, 1, 0), bias=True)
        t.conv("feature.out3", ("feature", "out3"), (2, 3, 1, 0))

    # ---- GeoFeatureFusion ----
    if use_geo_fusion:
        g = "GeoFeatureFusionNet"
        p = ("geo_fusion",)
        t.seq_convbn(f"{g}.rgb_conv_init", p + ("rgb_conv_init",))
        t.seq_convbn(f"{g}.depth_conv_init", p + ("depth_conv_init",))
        for layer in ("rgb_encoder_layer1", "rgb_encoder_layer2",
                      "rgb_encoder_layer3", "rgb_encoder_layer4",
                      "rgb_encoder_layer5", "depth_layer1", "depth_layer2",
                      "depth_layer3", "depth_layer4", "depth_layer5"):
            t.basic_block_geo(f"{g}.{layer}", p + (layer,))
        for layer in ("rgb_decoder_layer4", "rgb_decoder_layer2",
                      "rgb_decoder_layer0", "rgb_decoder_layer",
                      "rgb_decoder_output", "decoder_layer3",
                      "decoder_layer4", "decoder_layer5", "decoder_layer6",
                      "decoder_layer7", "rgbdepth_decoder_stage1",
                      "rgbdepth_decoder_stage2", "rgbdepth_decoder_stage3",
                      "final_decoder_stage1", "final_decoder_stage2",
                      "final_decoder_stage3"):
            t.seq_deconvbn(f"{g}.{layer}", p + (layer,))

    # ---- FMT pathway (checkpoints trained with the transformer enabled;
    # the shipped cas_mvsnet.py comments the call out, scripts name such
    # checkpoints "Trans", scripts/test_tnt.sh:12-15) ----
    if use_fmt:
        _map_fmt_pathway(t, "FMT_with_pathway.", ("fmt_pathway",))

    # ---- CostRegNet stages ----
    deconv_map = {"conv7": "Deconv3dBlock_0", "conv9": "Deconv3dBlock_1",
                  "conv11": "Deconv3dBlock_2"}
    for i in range(num_stage):
        rp = f"cost_regularization.{i}"
        op = (f"cost_reg_stage{i + 1}",)
        for j in range(7):
            t.block3d(f"{rp}.conv{j}", op + (f"Conv3dBlock_{j}",))
        for rk, ok in deconv_map.items():
            t.deconv_block3d(f"{rp}.{rk}", op + (ok,))
        t.conv(f"{rp}.prob", op + ("prob",), (2, 3, 4, 1, 0))

    # ---- AggWeightNet stages (w_net only; conv0 is dead in the reference) ----
    if agg_mode == "adaptive":
        for i in range(num_stage):
            for j in range(2):
                t.block3d(f"DepthNet.weight_net.{i}.w_net.{j}",
                          (f"agg_weight_stage{i + 1}", f"Conv3dBlock_{j}"))
            # mark the dead conv0 keys as consumed
            for suffix in (".conv0.conv.weight", ".conv0.bn.weight",
                           ".conv0.bn.bias", ".conv0.bn.running_mean",
                           ".conv0.bn.running_var",
                           ".conv0.bn.num_batches_tracked"):
                t.used.add(f"DepthNet.weight_net.{i}{suffix}")

    unused = sorted(set(sd) - t.used)
    if unused:
        raise ValueError(f"unmapped reference keys ({len(unused)}): "
                         f"{unused[:8]}...")
    return {"params": t.params, "batch_stats": t.stats}
