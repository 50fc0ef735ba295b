"""Per-view visibility weight net for adaptive cost aggregation.

Parity with AggWeightNetVolume (/root/reference/models/module.py:544-563):
w_net = Conv3d(C -> 1, 1x1x1, BN, ReLU) -> Conv3d(1 -> 1, 1x1x1, BN, ReLU),
applied to the squared feature difference volume. (The reference also
constructs an unused ``conv0``; it never participates in forward and is
omitted here.)
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .blocks import BN_EPS, Conv3dBlock


class AggWeightNetVolume(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, D, H, W, C] -> [B, D, H, W, 1] non-negative weights."""
        w = Conv3dBlock(1, kernel_size=1, stride=1, padding=0)(x, train)
        w = Conv3dBlock(1, kernel_size=1, stride=1, padding=0)(w, train)
        return w


def fold_aggweight(variables):
    """Collapse an AggWeightNetVolume into its inference affine form.

    Both stages are 1x1x1 convs, so with BN running statistics folded in
    the whole net is  w(x) = relu(w2 * relu(x @ w1 + b1) + b2)  — the form
    the fused Pallas cost-volume kernel (ops/pallas/fused_costvol.py)
    evaluates per voxel. ``variables`` is the bound submodule's variable
    dict ({"params": ..., "batch_stats": ...}).

    Returns (w1 [C] f32, b1, w2, b2 scalars f32).
    """
    params = variables["params"]
    stats = variables["batch_stats"]

    def fold(block):
        kernel = params[block]["Conv_0"]["kernel"]  # [1,1,1,Cin,1]
        bn_p = params[block]["_NormAct_0"]["BatchNorm_0"]
        bn_s = stats[block]["_NormAct_0"]["BatchNorm_0"]
        s = bn_p["scale"] / jnp.sqrt(bn_s["var"] + BN_EPS)  # [1]
        t = bn_p["bias"] - bn_s["mean"] * s  # [1]
        return (kernel[0, 0, 0, :, 0] * s[0]).astype(jnp.float32), \
            t[0].astype(jnp.float32)

    w1, b1 = fold("Conv3dBlock_0")
    w2, b2 = fold("Conv3dBlock_1")
    return w1, b1, w2[0], b2


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
