"""Depth-block repacking: exact MXU-friendly execution of 3-D convs.

The CostRegNet 3-D U-Net (/root/reference/models/module.py:510-541) has
8/16/32/64 channels — on TPU a conv's output-channel count is the matmul
N dimension, so C=8 uses 8 of the MXU's 128 lanes (~2% utilization
measured at DTU eval geometry, PERF_STAGES_r03.json). Repacking folds a
block of ``b`` consecutive depth hypotheses into the channel axis:

    [B, D, H, W, C]  ->  [B, D/b, H, W, b*C]   (slot-major channels)

and replaces each (3,3,3) conv by a KQ=3-tap conv along the *block* axis
whose big kernel is the original kernel scattered into a block-banded
layout by a constant 0/1 placement tensor. The embedding is EXACT (every
original tap appears exactly once; taps that would read depth padding map
to the zero pad *block*), so plain and repacked execution agree up to
float reassociation, the same parameters serve both paths, and autodiff
works through the einsum — training benefits too.

Cost model: the block kernel does ``b``x the original FLOPs (the
placement tensor is mostly zeros) but raises the matmul N dim from C to
b*C — net ~3-5x faster for C=8..16 at b=8..16 on a 128-lane MXU.

Slot-matching algebra (depth index = block*b + slot; KQ=3 block taps
suffice because a +-1 depth tap never spans more than one block
boundary, and stride-2 levels keep the window within 3 blocks whenever
b_out ∈ {b_in, b_in/2}):

  conv, depth stride sd, depth pad (kd-1)//2, block stride
  sblk = sd*b_out/b_in (an integer >= 1 by the b_out constraint):
    in_depth  i = (sblk*blk_out + q - 1)*b_in + ri
    out_depth o = blk_out*b_out + ro,  tap d = i - sd*o + pad
      => d = b_in*(q - 1) + ri - sd*ro + pad       (blk_out cancels)

  transposed conv k=3, stride 2, pad 1, output_pad 1 (torch semantics
  o = 2i + d - 1), two exact block plans:
    b_out == b_in:   block count doubles — the block axis is itself a
      k3/s2/p1/op1 transposed conv: blk_out = 2*blk_in + (q - 1)
      => d = b_in*(q - 1) + ro - 2*ri + 1
    b_out == 2*b_in: block count is constant — block axis is a plain
      stride-1 pad-1 conv reading blk_in = blk_out - (q - 1)
      => d = 2*b_in*(1 - q) + ro - 2*ri + 1   (conv index convention)

Entries where d falls outside [0, kd) get placement 0; any live entry
that reads a padded block corresponds to an original tap into depth
padding (a zero tap), so the embedding stays exact at the edges.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

KQ = 3  # block-axis kernel size of the k=3 deconv plans (the conv plan
# computes its own window size; see _placement_conv)


def repack(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """[B, D, H, W, C] -> [B, D//b, H, W, b*C]; slot-major channels."""
    bb, d, h, w, c = x.shape
    assert d % b == 0, (d, b)
    x = x.reshape(bb, d // b, b, h, w, c)
    return jnp.moveaxis(x, 2, 4).reshape(bb, d // b, h, w, b * c)


def unpack(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """Inverse of :func:`repack`."""
    bb, dblk, h, w, bc = x.shape
    c = bc // b
    x = x.reshape(bb, dblk, h, w, b, c)
    return jnp.moveaxis(x, 4, 2).reshape(bb, dblk * b, h, w, c)


def repack2d(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H//b, W, b*C]; slot-major channels."""
    bb, h, w, c = x.shape
    assert h % b == 0, (h, b)
    x = x.reshape(bb, h // b, b, w, c)
    return jnp.moveaxis(x, 2, 3).reshape(bb, h // b, w, b * c)


def unpack2d(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """Inverse of :func:`repack2d`."""
    bb, hblk, w, bc = x.shape
    c = bc // b
    x = x.reshape(bb, hblk, w, b, c)
    return jnp.moveaxis(x, 3, 2).reshape(bb, hblk * b, w, c)


@functools.lru_cache(maxsize=None)
def _placement_conv(b_in: int, b_out: int, kd: int, stride_d: int):
    """Block plan for a strided conv with depth padding (kd-1)//2.

    Returns (p [kd, KQ_eff, b_in, b_out], pad_lo, pad_hi): the placement
    tensor, with the block-axis window size KQ_eff and asymmetric block
    padding computed so every original tap is representable (a fixed
    KQ=3 silently drops the last slot's top tap for k=5/stride=2).
    Window block q reads input block sblk*blk_out + q - pad_lo, so
      d = b_in*(q - pad_lo) + ri - stride*ro + pad.
    """
    pad = (kd - 1) // 2
    # conservative block-offset range o_q = q - pad_lo over all (d, ri, ro)
    qlo = (0 - pad - (b_in - 1)) // b_in  # floor division
    qhi = ((kd - 1) - pad + stride_d * (b_out - 1)) // b_in
    kq = qhi - qlo + 1
    p = np.zeros((kd, kq, b_in, b_out), np.float32)
    for q in range(kq):
        for ri in range(b_in):
            for ro in range(b_out):
                d = b_in * (q + qlo) + ri - stride_d * ro + pad
                if 0 <= d < kd:
                    p[d, q, ri, ro] = 1.0
    # trim window planes with no live taps
    live = p.any(axis=(0, 2, 3))
    first, last = int(np.argmax(live)), int(len(live) - np.argmax(live[::-1]) - 1)
    p = p[:, first:last + 1]
    return p, -(qlo + first), qhi - (kq - 1 - last)


@functools.lru_cache(maxsize=None)
def _placement_deconv(b_in: int, b_out: int, kd: int):
    """P for torch ConvTranspose(k=kd, stride 2, pad 1, out_pad 1)."""
    p = np.zeros((kd, KQ, b_in, b_out), np.float32)
    for q in range(KQ):
        for ri in range(b_in):
            for ro in range(b_out):
                if b_out == b_in:
                    d = b_in * (q - 1) + ro - 2 * ri + 1
                elif b_out == 2 * b_in:
                    d = 2 * b_in * (1 - q) + ro - 2 * ri + 1
                else:
                    raise ValueError((b_in, b_out))
                if 0 <= d < kd:
                    p[d, q, ri, ro] = 1.0
    return p


def _block_kernel(w: jnp.ndarray, p: np.ndarray) -> jnp.ndarray:
    """w [kd, *k_sp, Cin, Cout], p [kd, KQ, b_in, b_out] ->
    [KQ, *k_sp, b_in*Cin, b_out*Cout] (slot-major channel layout)."""
    ci, co = w.shape[-2:]
    sp = w.shape[1:-2]
    w3 = w.reshape(w.shape[0], -1, ci, co)
    # slot-major channel grouping on BOTH sides: (r, i) and (s, o)
    big = jnp.einsum("dkio,dqrs->qkriso", w3, jnp.asarray(p))
    return big.reshape((p.shape[1],) + sp
                       + (p.shape[2] * ci, p.shape[3] * co))


def _conv_repacked(x, w, block_in, block_out, stride_blk_axis, strides_sp,
                   pads_sp, dn):
    """Shared body of conv{2,3}d_repacked: the repacked axis is the first
    spatial axis of ``dn``."""
    kd = w.shape[0]
    p, pad_lo, qhi = _placement_conv(block_in, block_out, kd,
                                     stride_blk_axis)
    sblk = stride_blk_axis * block_out // block_in
    assert sblk * block_in == stride_blk_axis * block_out >= block_in, (
        stride_blk_axis, block_in, block_out)
    cnt_in = x.shape[1]
    # original output size with pad (kd-1)//2:
    d_in = cnt_in * block_in
    d_out = (d_in + 2 * ((kd - 1) // 2) - kd) // stride_blk_axis + 1
    cnt_out = -(-d_out // block_out)
    assert cnt_out * block_out == d_out, (d_out, block_out)
    # trim window planes that can only ever read padded (zero) blocks at
    # THIS block count — exact, and a 3x FLOP cut whenever the depth axis
    # folds into few blocks (cnt_in == 1 keeps a single plane: the whole
    # U-Net level degenerates to a 2-D conv on the folded channels)
    offs = [q - pad_lo for q in range(p.shape[1])]
    keep = [any(0 <= sblk * bo + o < cnt_in for bo in range(cnt_out))
            for o in offs]
    first = keep.index(True)
    last = len(keep) - 1 - keep[::-1].index(True)
    p = p[:, first:last + 1]
    o_first, o_last = offs[first], offs[last]
    pad_hi = sblk * (cnt_out - 1) + o_last - (cnt_in - 1)
    big = _block_kernel(w, p).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, big,
        window_strides=(sblk,) + strides_sp,
        padding=((max(-o_first, 0), max(pad_hi, 0)),) + pads_sp,
        dimension_numbers=dn,
    )


def conv3d_repacked(x: jnp.ndarray, w: jnp.ndarray, *, block_in: int,
                    block_out: int, stride_d: int, stride_hw: int,
                    pad_hw: int) -> jnp.ndarray:
    """Strided 3-D conv on a repacked tensor.

    x [B, Dblk, H, W, block_in*Cin]; w [kd, kh, kw, Cin, Cout] (plain
    layout). Depth padding is (kd-1)//2 (the U-Net's pad=1 for k=3).
    Returns [B, Dblk', H', W', block_out*Cout].
    """
    return _conv_repacked(x, w, block_in, block_out, stride_d,
                          (stride_hw, stride_hw),
                          ((pad_hw, pad_hw), (pad_hw, pad_hw)),
                          ("NDHWC", "DHWIO", "NDHWC"))


def conv2d_repacked(x: jnp.ndarray, w: jnp.ndarray, *, block_in: int,
                    block_out: int, stride: int, pad_w: int) -> jnp.ndarray:
    """Strided 2-D conv with the HEIGHT axis repacked into channels.

    x [B, Hblk, W, block_in*Cin]; w [kh, kw, Cin, Cout] (plain layout).
    Height padding is (kh-1)//2 (torch 'same'-style, the FPN's 3/1 and
    5/2 shapes); the W axis keeps the caller's stride/pad. Returns
    [B, Hblk', W', block_out*Cout].
    """
    return _conv_repacked(x, w, block_in, block_out, stride, (stride,),
                          ((pad_w, pad_w),), ("NHWC", "HWIO", "NHWC"))


def _deconv_repacked(x, w, block_in, block_out, nsp, dn):
    """Shared body of deconv{2,3}d_repacked (k=3/s=2/p=1/op=1 only);
    ``nsp`` = number of non-block spatial axes."""
    kd = w.shape[0]
    p = _placement_deconv(block_in, block_out, kd)
    big = _block_kernel(w, p).astype(x.dtype)
    if block_out == block_in:
        # block count doubles: the block axis is a k3/s2/p1/op1 transposed
        # conv — full-flip + lhs dilation on all axes
        pads = ((1, 2),) * (nsp + 1)  # k-1-p, k-1-p+output_padding
        flipped = big[(slice(None, None, -1),) * (nsp + 1)]
        return jax.lax.conv_general_dilated(
            x, flipped, window_strides=(1,) * (nsp + 1), padding=pads,
            lhs_dilation=(2,) * (nsp + 1), dimension_numbers=dn)
    # block count constant, block size doubles: the block axis is a plain
    # stride-1 conv (placement already built in conv index convention);
    # spatial axes are still transposed convs. Trim block-window planes
    # that can only read padded blocks (exact; cnt == 1 keeps 1 of 3).
    cnt = x.shape[1]
    keep = [any(0 <= bo + (q - 1) < cnt for bo in range(cnt))
            for q in range(big.shape[0])]
    first = keep.index(True)
    last = len(keep) - 1 - keep[::-1].index(True)
    big = big[first:last + 1]
    pads = ((max(1 - first, 0), max(last - 1, 0)),) + ((1, 2),) * nsp
    flipped = big[(slice(None),) + (slice(None, None, -1),) * nsp]
    return jax.lax.conv_general_dilated(
        x, flipped, window_strides=(1,) * (nsp + 1), padding=pads,
        lhs_dilation=(1,) + (2,) * nsp, dimension_numbers=dn)


def deconv3d_repacked(x: jnp.ndarray, w: jnp.ndarray, *, block_in: int,
                      block_out: int) -> jnp.ndarray:
    """Torch ConvTranspose3d(k=3, stride 2, pad 1, output_pad 1) on a
    repacked tensor (the U-Net's only deconv shape). x [B, Dblk, H, W,
    block_in*Cin]; w [3, 3, 3, Cin, Cout]. Output doubles D, H, W."""
    return _deconv_repacked(x, w, block_in, block_out, 2,
                            ("NDHWC", "DHWIO", "NDHWC"))


def deconv2d_repacked(x: jnp.ndarray, w: jnp.ndarray, *, block_in: int,
                      block_out: int) -> jnp.ndarray:
    """Torch ConvTranspose2d(k=3, stride 2, pad 1, output_pad 1) with the
    HEIGHT axis repacked. x [B, Hblk, W, block_in*Cin]; w [3, 3, Cin,
    Cout]. Output doubles H and W."""
    return _deconv_repacked(x, w, block_in, block_out, 1,
                            ("NHWC", "HWIO", "NHWC"))


def height_block(h: int, cout: int, cap: int = 16) -> int:
    """Largest useful height-block size: enough slots to fill the 128-lane
    MXU for ``cout`` output channels (the repacking FLOP multiplier is the
    block size, so more than 128 lanes only wastes), bounded by the
    power-of-two divisibility of ``h`` and ``cap``."""
    pow2 = h & -h
    want = 128 // max(1, min(128, cout))
    want = 1 << (max(1, want).bit_length() - 1)  # round down to pow2
    return max(1, min(cap, want, pow2))


def level_blocks(d: int, block: int, num_levels: int = 4) -> list[int] | None:
    """Per-U-Net-level block sizes for entry depth ``d`` and target block
    size ``block``: the largest power of two dividing the level depth,
    capped at ``block``. Returns None when any level's depth is odd above
    level 0 (repacking would not be exact there) or block < 2."""
    if block < 2:
        return None
    out = []
    for lvl in range(num_levels):
        dl = d >> lvl
        if dl << lvl != d or dl == 0:
            return None  # depth not divisible by 2^lvl
        pow2 = dl & -dl  # largest power-of-two divisor
        out.append(min(block, pow2, dl))
    return out
