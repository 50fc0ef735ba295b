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

KQ = 3  # block-axis kernel size (see module docstring)


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


@functools.lru_cache(maxsize=None)
def _placement_conv(b_in: int, b_out: int, kd: int, stride_d: int):
    """P[d, q, ri, ro] for a strided conv with depth padding (kd-1)//2."""
    pad = (kd - 1) // 2
    p = np.zeros((kd, KQ, b_in, b_out), np.float32)
    for q in range(KQ):
        for ri in range(b_in):
            for ro in range(b_out):
                d = b_in * (q - 1) + ri - stride_d * ro + pad
                if 0 <= d < kd:
                    p[d, q, ri, ro] = 1.0
    return p


@functools.lru_cache(maxsize=None)
def _placement_deconv(b_in: int, b_out: int, kd: int):
    """P for torch ConvTranspose3d(k=kd, stride 2, pad 1, out_pad 1)."""
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
    """w [kd, kh, kw, Cin, Cout], p [kd, KQ, b_in, b_out] ->
    [KQ, kh, kw, b_in*Cin, b_out*Cout] (slot-major channel layout)."""
    kd, kh, kw, ci, co = w.shape
    # slot-major channel grouping on BOTH sides: (r, i) and (s, o)
    big = jnp.einsum("dhwio,dqrs->qhwriso", w, jnp.asarray(p))
    return big.reshape(KQ, kh, kw, p.shape[2] * ci, p.shape[3] * co)


def conv3d_repacked(x: jnp.ndarray, w: jnp.ndarray, *, block_in: int,
                    block_out: int, stride_d: int, stride_hw: int,
                    pad_hw: int) -> jnp.ndarray:
    """Strided 3-D conv on a repacked tensor.

    x [B, Dblk, H, W, block_in*Cin]; w [kd, kh, kw, Cin, Cout] (plain
    layout). Depth padding is (kd-1)//2 (the U-Net's pad=1 for k=3).
    Returns [B, Dblk', H', W', block_out*Cout].
    """
    kd = w.shape[0]
    p = _placement_conv(block_in, block_out, kd, stride_d)
    big = _block_kernel(w, p).astype(x.dtype)
    sblk = stride_d * block_out // block_in
    assert sblk * block_in == stride_d * block_out >= block_in, (
        stride_d, block_in, block_out)
    return jax.lax.conv_general_dilated(
        x, big,
        window_strides=(sblk, stride_hw, stride_hw),
        padding=((1, 1), (pad_hw, pad_hw), (pad_hw, pad_hw)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def deconv3d_repacked(x: jnp.ndarray, w: jnp.ndarray, *, block_in: int,
                      block_out: int) -> jnp.ndarray:
    """Torch ConvTranspose3d(k=3, stride 2, pad 1, output_pad 1) on a
    repacked tensor (the U-Net's only deconv shape). x [B, Dblk, H, W,
    block_in*Cin]; w [3, 3, 3, Cin, Cout]. Output doubles D, H, W."""
    kd = w.shape[0]
    p = _placement_deconv(block_in, block_out, kd)
    big = _block_kernel(w, p).astype(x.dtype)
    if block_out == block_in:
        # block count doubles: the block axis is a k3/s2/p1/op1 transposed
        # conv — full-flip + lhs dilation on all three axes
        pads = ((1, 2), (1, 2), (1, 2))  # k-1-p, k-1-p+output_padding
        flipped = big[::-1, ::-1, ::-1]
        return jax.lax.conv_general_dilated(
            x, flipped, window_strides=(1, 1, 1), padding=pads,
            lhs_dilation=(2, 2, 2), dimension_numbers=("NDHWC", "DHWIO",
                                                       "NDHWC"))
    # block count constant, block size doubles: the block axis is a plain
    # stride-1 conv (placement already built in conv index convention);
    # spatial axes are still transposed convs
    pads = ((1, 1), (1, 2), (1, 2))
    flipped = big[:, ::-1, ::-1]
    return jax.lax.conv_general_dilated(
        x, flipped, window_strides=(1, 1, 1), padding=pads,
        lhs_dilation=(1, 2, 2), dimension_numbers=("NDHWC", "DHWIO",
                                                   "NDHWC"))


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
