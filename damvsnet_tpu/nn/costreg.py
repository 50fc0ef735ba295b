"""3-D cost-volume regularizers.

CostRegNet — the CasMVSNet 3D U-Net (parity:
/root/reference/models/module.py:510-541): three stride-2 encoder levels
(channels x2 each), three transposed-conv decoder levels with additive
skips, and a final 1-channel conv (no BN/ReLU/bias).

Reg2d — the GeoMVSNet-style (1,3,3)-kernel regularizer
(models/module.py:465-506): spatial-only strides, depth axis untouched.

Layout: volumes are NDHWC [B, D, H, W, C].
"""
from __future__ import annotations

import flax.linen as nn

from .precision import get_compute_dtype
import jax.numpy as jnp

from .blocks import Conv3dBlock, Deconv3dBlock, conv_transpose_torch


class CostRegNet(nn.Module):
    base_channels: int = 8
    slab_axis: str | None = None  # depth-slab mesh axis: every U-Net level
    # is explicitly constrained (sharded while its D divides the axis,
    # replicated below) so GSPMD plans the reshards instead of falling
    # back to involuntary full rematerialization at the bottleneck
    depth_block: int = 0  # >0: execute every 3-D conv depth-repacked
    # (ops/depthblock.py) — folds up to this many depth hypotheses into
    # the channel axis so the narrow-channel convs (C=8..64, ~2% MXU at
    # eval geometry) fill the 128-lane MXU. Exact: same parameters, same
    # math up to float reassociation; works under autodiff and BN.

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..parallel.mesh import slab_constraint
        c = self.base_channels
        # no-op during flax init: init traces outside any mesh context and
        # the "no active mesh" warning there is noise (cascade.py does the
        # same for its volume constraint)
        if self.is_initializing():
            slab = lambda t: t
        else:
            slab = lambda t: slab_constraint(t, self.slab_axis)
        lb = None
        if self.depth_block:
            from ..ops.depthblock import level_blocks
            lb = level_blocks(x.shape[1], self.depth_block)
        prob = nn.Conv(1, (3, 3, 3), padding=1, use_bias=False,
                       dtype=get_compute_dtype(), name="prob")
        if lb is None:
            db = lambda i, o: None
            conv0 = slab(Conv3dBlock(c, 3, 1, padding=1)(x, train, db(0, 0)))
            conv2 = slab(Conv3dBlock(2 * c, 3, 2, padding=1)(conv0, train, db(0, 1)))
            conv2 = slab(Conv3dBlock(2 * c, 3, 1, padding=1)(conv2, train, db(1, 1)))
            conv4 = slab(Conv3dBlock(4 * c, 3, 2, padding=1)(conv2, train, db(1, 2)))
            conv4 = slab(Conv3dBlock(4 * c, 3, 1, padding=1)(conv4, train, db(2, 2)))
            x = slab(Conv3dBlock(8 * c, 3, 2, padding=1)(conv4, train, db(2, 3)))
            x = slab(Conv3dBlock(8 * c, 3, 1, padding=1)(x, train, db(3, 3)))
            x = slab(conv4 + Deconv3dBlock(4 * c, 3, 2, padding=1, output_padding=1)(x, train, db(3, 2)))
            x = slab(conv2 + Deconv3dBlock(2 * c, 3, 2, padding=1, output_padding=1)(x, train, db(2, 1)))
            x = slab(conv0 + Deconv3dBlock(c, 3, 2, padding=1, output_padding=1)(x, train, db(1, 0)))
            return prob(x)  # [B, D, H, W, 1]
        # Repacked ladder: fold lb[level] depth slots into channels ONCE and
        # stay packed through every conv/BN/ReLU/skip — per-conv
        # repack/unpack transposes (measured ~1 ms each at eval geometry)
        # never happen; BN statistics stay per-original-channel via the
        # [..., b, C] view inside _NormAct. Exact: same params, same math.
        from ..ops.depthblock import conv3d_repacked, repack, unpack
        db = lambda i, o: (lb[i], lb[o])
        xp = repack(x, lb[0])
        conv0 = slab(Conv3dBlock(c, 3, 1, padding=1)(xp, train, db(0, 0), packed=True))
        conv2 = slab(Conv3dBlock(2 * c, 3, 2, padding=1)(conv0, train, db(0, 1), packed=True))
        conv2 = slab(Conv3dBlock(2 * c, 3, 1, padding=1)(conv2, train, db(1, 1), packed=True))
        conv4 = slab(Conv3dBlock(4 * c, 3, 2, padding=1)(conv2, train, db(1, 2), packed=True))
        conv4 = slab(Conv3dBlock(4 * c, 3, 1, padding=1)(conv4, train, db(2, 2), packed=True))
        xp = slab(Conv3dBlock(8 * c, 3, 2, padding=1)(conv4, train, db(2, 3), packed=True))
        xp = slab(Conv3dBlock(8 * c, 3, 1, padding=1)(xp, train, db(3, 3), packed=True))
        xp = slab(conv4 + Deconv3dBlock(4 * c, 3, 2, padding=1, output_padding=1)(xp, train, db(3, 2), packed=True))
        xp = slab(conv2 + Deconv3dBlock(2 * c, 3, 2, padding=1, output_padding=1)(xp, train, db(2, 1), packed=True))
        xp = slab(conv0 + Deconv3dBlock(c, 3, 2, padding=1, output_padding=1)(xp, train, db(1, 0), packed=True))
        # final prob conv, repacked too: XLA lowers a Cout=1 conv3d as a
        # window reduce (measured 30x off roofline); Cout becomes lb[0]
        _ = prob(xp[:, :1, :1, :1, :c])  # bind params; dead code at run
        k = prob.variables["params"]["kernel"]  # [3, 3, 3, C, 1]
        cdt = get_compute_dtype() or xp.dtype  # match nn.Conv's cast
        xp = conv3d_repacked(xp.astype(cdt), k.astype(cdt), block_in=lb[0],
                             block_out=lb[0], stride_d=1, stride_hw=1,
                             pad_hw=1)
        return unpack(xp, lb[0])  # [B, D, H, W, 1]


class Reg2d(nn.Module):
    """(1,3,3)-kernel pseudo-2D regularizer (depth axis preserved)."""
    base_channels: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.base_channels
        k = (1, 3, 3)
        p = (0, 1, 1)
        s = (1, 2, 2)
        conv0 = Conv3dBlock(c, k, 1, padding=p)(x, train)
        conv2 = Conv3dBlock(2 * c, k, s, padding=p)(conv0, train)
        conv2 = Conv3dBlock(2 * c, 3, 1, padding=1)(conv2, train)
        conv4 = Conv3dBlock(4 * c, k, s, padding=p)(conv2, train)
        conv4 = Conv3dBlock(4 * c, 3, 1, padding=1)(conv4, train)
        x = Conv3dBlock(8 * c, k, s, padding=p)(conv4, train)
        x = Conv3dBlock(8 * c, 3, 1, padding=1)(x, train)
        x = conv4 + Deconv3dBlock(4 * c, k, s, padding=p, output_padding=(0, 1, 1))(x, train)
        x = conv2 + Deconv3dBlock(2 * c, k, s, padding=p, output_padding=(0, 1, 1))(x, train)
        x = conv0 + Deconv3dBlock(c, k, s, padding=p, output_padding=(0, 1, 1))(x, train)
        x = nn.Conv(1, (1, 1, 1), dtype=get_compute_dtype(), name="prob")(x)
        return x[..., 0]  # [B, D, H, W]
