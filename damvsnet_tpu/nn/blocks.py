"""Conv / BN / ReLU building blocks (flax linen, NHWC / NDHWC).

Behavioral parity with the reference block zoo
(/root/reference/models/module.py:28-294): Conv{2,3}d and Deconv{2,3}d with
optional BatchNorm (torch momentum 0.1 -> flax momentum 0.9, eps 1e-5) and
ReLU; bias is present iff BN is absent. Transposed convs follow torch
``ConvTranspose{2,3}d`` semantics exactly (stride-dilated input, kernel
flipped, padding (k-1-p, k-1-p+output_padding)), via
:func:`conv_transpose_torch`.

All modules take ``train: bool`` to select batch-stat vs running-stat
normalization. Under jit+GSPMD, batch statistics are computed over the
global (sharded) batch automatically — the cross-replica syncBN the
reference gets from apex (train.py:464-470) falls out of the sharding.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .precision import get_compute_dtype

BN_MOMENTUM = 0.9  # == torch momentum 0.1
BN_EPS = 1e-5


def _tuple(v, n):
    if isinstance(v, (tuple, list)):
        assert len(v) == n
        return tuple(v)
    return (v,) * n


def conv_transpose_torch(x: jnp.ndarray, kernel: jnp.ndarray,
                         strides, padding, output_padding) -> jnp.ndarray:
    """Torch-semantics transposed convolution.

    x: [B, *spatial, Cin]; kernel: [*k, Cin, Cout] (HWIO-style).
    out_size = (in-1)*stride - 2*pad + k + output_padding.
    """
    ndim = x.ndim - 2
    strides = _tuple(strides, ndim)
    padding = _tuple(padding, ndim)
    output_padding = _tuple(output_padding, ndim)
    ks = kernel.shape[:ndim]
    pads = tuple(
        (k - 1 - p, k - 1 - p + op)
        for k, p, op in zip(ks, padding, output_padding)
    )
    flipped = kernel[(slice(None, None, -1),) * ndim]
    if ndim == 2:
        dn = ("NHWC", "HWIO", "NHWC")
    elif ndim == 3:
        dn = ("NDHWC", "DHWIO", "NDHWC")
    else:
        raise ValueError(f"unsupported spatial rank {ndim}")
    return jax.lax.conv_general_dilated(
        x, flipped,
        window_strides=(1,) * ndim,
        padding=pads,
        lhs_dilation=strides,
        rhs_dilation=(1,) * ndim,
        dimension_numbers=dn,
    )


class _NormAct(nn.Module):
    """Shared BN + ReLU tail.

    ``blocks > 1``: x carries a repacked (slot-major) channel axis of size
    blocks*C (ops/depthblock.py); statistics/affine are applied per
    ORIGINAL channel by viewing the last axis as [blocks, C] — a free
    minor-dims reshape — so plain and repacked execution share the same
    parameters and the same math.

    At inference (not train, stats exist) BatchNorm is a pure per-channel
    affine; it is folded to x*s + t computed in f32 from the running
    stats and the result cast back to the compute dtype. Keeping the
    flax BatchNorm output f32 instead measurably poisons the whole graph
    downstream (f32 FPN adds/resizes, f32 dual-output conv fusions,
    2x-bandwidth layout copies) — the fold is where round 4's
    "bf16 everywhere between matmuls" actually happens.
    """
    use_bn: bool = True
    use_relu: bool = True
    bn_momentum: float = BN_MOMENTUM

    @nn.compact
    def __call__(self, x, train: bool, blocks: int = 1):
        view = x
        if blocks > 1:
            view = x.reshape(x.shape[:-1] + (blocks, x.shape[-1] // blocks))
        if self.use_bn:
            bn = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=BN_EPS,
                dtype=jnp.float32,
            )
            if train or self.is_initializing():
                view = bn(view)
            else:
                # bind the variables without running the full-volume op
                # (dead code at run time), then fold to one affine
                _ = bn(view[(slice(0, 1),) * (view.ndim - 1)])
                stats = bn.variables["batch_stats"]
                params = bn.variables.get("params", {})
                var = stats["var"].astype(jnp.float32)
                mean = stats["mean"].astype(jnp.float32)
                s = jax.lax.rsqrt(var + BN_EPS)
                t = -mean * s
                if "scale" in params:
                    g = params["scale"].astype(jnp.float32)
                    s, t = s * g, t * g
                if "bias" in params:
                    t = t + params["bias"].astype(jnp.float32)
                view = (view.astype(jnp.float32) * s + t).astype(x.dtype)
        if self.use_relu:
            view = nn.relu(view)
        return view.reshape(x.shape) if blocks > 1 else view


class Conv2dBlock(nn.Module):
    """Conv2d (+BN+ReLU). Parity: models/module.py:28-68 / ConvBnReLU :206-213.

    ``height_blocks=(b_in, b_out)`` executes the conv height-repacked
    (ops/depthblock.py): [B, H, W, C] folded to [B, H/b_in, W, b_in*C] so
    the matmul N dim is b_out*features — exact, same params; the image
    encoders' narrow channel counts (8-32) otherwise strand the MXU."""
    features: int
    kernel_size: int | Sequence[int] = 3
    stride: int | Sequence[int] = 1
    padding: int | Sequence[int] | None = None  # None => torch default 0
    relu: bool = True
    bn: bool = True
    bn_momentum: float = BN_MOMENTUM

    @nn.compact
    def __call__(self, x, train: bool = False, height_blocks=None):
        k = _tuple(self.kernel_size, 2)
        p = _tuple(0 if self.padding is None else self.padding, 2)
        s = _tuple(self.stride, 2)
        conv = nn.Conv(
            self.features, k,
            strides=s,
            padding=[(pi, pi) for pi in p],
            use_bias=not self.bn,
            dtype=get_compute_dtype(),
        )
        if height_blocks is None:
            x = conv(x)
        else:
            from ..ops.depthblock import conv2d_repacked, repack2d, unpack2d
            b_in, b_out = height_blocks
            assert p[0] == (k[0] - 1) // 2 and s[0] == s[1], (k, p, s)
            _ = conv(x[:, :1, :1, :])  # bind params; dead code at run
            params = conv.variables["params"]
            cdt = get_compute_dtype() or x.dtype
            y = conv2d_repacked(
                repack2d(x.astype(cdt), b_in), params["kernel"],
                block_in=b_in, block_out=b_out, stride=s[0], pad_w=p[1])
            x = unpack2d(y, b_out)
            if not self.bn:
                x = x + params["bias"].astype(x.dtype)
        return _NormAct(self.bn, self.relu, self.bn_momentum)(x, train)


class Conv3dBlock(nn.Module):
    """Conv3d (+BN+ReLU), NDHWC. Parity: models/module.py:117-159 / :227-234.

    ``depth_blocks=(b_in, b_out)`` executes the conv depth-repacked
    (ops/depthblock.py): input [B, D, H, W, C] is folded to
    [B, D/b_in, H, W, b_in*C] so the matmul N dim is b_out*features
    instead of features — exact, same parameters, MXU-friendly. BN/ReLU
    always run in plain layout (per-channel statistics stay exact)."""
    features: int
    kernel_size: int | Sequence[int] = 3
    stride: int | Sequence[int] = 1
    padding: int | Sequence[int] | None = None
    relu: bool = True
    bn: bool = True
    bn_momentum: float = BN_MOMENTUM

    @nn.compact
    def __call__(self, x, train: bool = False, depth_blocks=None,
                 packed: bool = False):
        k = _tuple(self.kernel_size, 3)
        p = _tuple(0 if self.padding is None else self.padding, 3)
        s = _tuple(self.stride, 3)
        conv = nn.Conv(
            self.features, k,
            strides=s,
            padding=[(pi, pi) for pi in p],
            use_bias=not self.bn,
            dtype=get_compute_dtype(),
        )
        if depth_blocks is None:
            assert not packed
            x = conv(x)
            return _NormAct(self.bn, self.relu, self.bn_momentum)(x, train)
        from ..ops.depthblock import conv3d_repacked, repack, unpack
        b_in, b_out = depth_blocks
        assert p[0] == (k[0] - 1) // 2 and s[1] == s[2], (k, p, s)
        # bind the conv's params without running it on the full volume
        # (the tiny-slice call is dead code XLA eliminates at run time);
        # in packed mode the channel axis carries b_in*Cin — slice it
        # down so the bound kernel keeps its plain [*, Cin, Cout] shape
        cin = x.shape[-1] // b_in if packed else x.shape[-1]
        _ = conv(x[:, :1, :1, :1, :cin])
        params = conv.variables["params"]
        cdt = get_compute_dtype() or x.dtype
        y = conv3d_repacked(
            x.astype(cdt) if packed else repack(x.astype(cdt), b_in),
            params["kernel"], block_in=b_in, block_out=b_out,
            stride_d=s[0], stride_hw=s[1], pad_hw=p[1])
        if not self.bn:
            # slot-major packed channels: channel index = slot*C + c
            y = y + jnp.tile(params["bias"].astype(y.dtype), b_out)
        y = _NormAct(self.bn, self.relu, self.bn_momentum)(
            y, train, blocks=b_out)
        return y if packed else unpack(y, b_out)


class Hourglass3d(nn.Module):
    """3-D hourglass with 1x1x1 redirect skips (parity: models/module.py:266-294)."""
    channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channels
        conv1 = Conv3dBlock(2 * c, 3, 2, padding=1, name="conv1a")(x, train)
        conv1 = Conv3dBlock(2 * c, 3, 1, padding=1, name="conv1b")(conv1, train)
        conv2 = Conv3dBlock(4 * c, 3, 2, padding=1, name="conv2a")(conv1, train)
        conv2 = Conv3dBlock(4 * c, 3, 1, padding=1, name="conv2b")(conv2, train)
        dconv2 = Deconv3dBlock(2 * c, 3, 2, padding=1, output_padding=1,
                               relu=False, name="dconv2")(conv2, train)
        redir2 = Conv3dBlock(2 * c, 1, 1, padding=0, relu=False,
                             name="redir2")(conv1, train)
        dconv2 = nn.relu(dconv2 + redir2)
        dconv1 = Deconv3dBlock(c, 3, 2, padding=1, output_padding=1,
                               relu=False, name="dconv1")(dconv2, train)
        redir1 = Conv3dBlock(c, 1, 1, padding=0, relu=False,
                             name="redir1")(x, train)
        return nn.relu(dconv1 + redir1)


class Deconv2dBlock(nn.Module):
    """ConvTranspose2d (+BN+ReLU), torch semantics. Parity: module.py:71-115."""
    features: int
    kernel_size: int | Sequence[int] = 3
    stride: int | Sequence[int] = 1
    padding: int | Sequence[int] = 0
    output_padding: int | Sequence[int] = 0
    relu: bool = True
    bn: bool = True
    bn_momentum: float = BN_MOMENTUM

    @nn.compact
    def __call__(self, x, train: bool = False, height_blocks=None):
        k = _tuple(self.kernel_size, 2)
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            k + (cin, self.features), jnp.float32)
        cdt = get_compute_dtype() or x.dtype
        if height_blocks is not None:
            from ..ops.depthblock import (deconv2d_repacked, repack2d,
                                          unpack2d)
            b_in, b_out = height_blocks
            assert (k == (3, 3) and _tuple(self.stride, 2) == (2, 2)
                    and _tuple(self.padding, 2) == (1, 1)
                    and _tuple(self.output_padding, 2) == (1, 1))
            y = unpack2d(deconv2d_repacked(
                repack2d(x.astype(cdt), b_in), kernel.astype(cdt),
                block_in=b_in, block_out=b_out), b_out)
        else:
            y = conv_transpose_torch(x.astype(cdt), kernel.astype(cdt),
                                     self.stride, self.padding,
                                     self.output_padding)
        if not self.bn:
            bias = self.param("bias", nn.initializers.zeros, (self.features,),
                              jnp.float32)
            y = y + bias.astype(y.dtype)
        return _NormAct(self.bn, self.relu, self.bn_momentum)(y, train)


class Deconv3dBlock(nn.Module):
    """ConvTranspose3d (+BN+ReLU), torch semantics. Parity: module.py:161-202.

    ``depth_blocks=(b_in, b_out)`` executes depth-repacked — see
    Conv3dBlock; only the U-Net's k=3/stride=2/pad=1/out_pad=1 shape is
    supported on that path."""
    features: int
    kernel_size: int | Sequence[int] = 3
    stride: int | Sequence[int] = 1
    padding: int | Sequence[int] = 0
    output_padding: int | Sequence[int] = 0
    relu: bool = True
    bn: bool = True
    bn_momentum: float = BN_MOMENTUM

    @nn.compact
    def __call__(self, x, train: bool = False, depth_blocks=None,
                 packed: bool = False):
        k = _tuple(self.kernel_size, 3)
        b_in, b_out = depth_blocks if depth_blocks is not None else (1, 1)
        cin = x.shape[-1] // b_in if packed else x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            k + (cin, self.features), jnp.float32)
        cdt = get_compute_dtype() or x.dtype
        if depth_blocks is not None:
            from ..ops.depthblock import deconv3d_repacked, repack, unpack
            assert (k == (3, 3, 3) and _tuple(self.stride, 3) == (2, 2, 2)
                    and _tuple(self.padding, 3) == (1, 1, 1)
                    and _tuple(self.output_padding, 3) == (1, 1, 1))
            y = deconv3d_repacked(
                x.astype(cdt) if packed else repack(x.astype(cdt), b_in),
                kernel.astype(cdt), block_in=b_in, block_out=b_out)
            if not self.bn:
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,), jnp.float32)
                y = y + jnp.tile(bias.astype(y.dtype), b_out)
            y = _NormAct(self.bn, self.relu, self.bn_momentum)(
                y, train, blocks=b_out)
            return y if packed else unpack(y, b_out)
        assert not packed
        y = conv_transpose_torch(x.astype(cdt), kernel.astype(cdt),
                                 self.stride, self.padding,
                                 self.output_padding)
        if not self.bn:
            bias = self.param("bias", nn.initializers.zeros, (self.features,),
                              jnp.float32)
            y = y + bias.astype(y.dtype)
        return _NormAct(self.bn, self.relu, self.bn_momentum)(y, train)
