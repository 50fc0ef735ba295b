"""Image resizing with exact torch ``F.interpolate`` semantics.

The reference pipeline leans on three distinct resamplers whose conventions
must match to keep numerics:
  * bilinear, align_corners=False  — stage handoff upsampling of depth/conf
    (models/cas_mvsnet.py:220-253)
  * bilinear, align_corners=True   — CPC loss source-image scaling
    (models/module.py:656)
  * nearest (legacy torch)         — FPN top-down x2 upsampling
    (models/module.py:447-452)

``jax.image.resize`` antialiases on downsample and uses different edge
conventions, so these are implemented as explicit separable gathers.
All functions take NHWC ([B, H, W, C]) arrays.
"""
from __future__ import annotations

import jax.numpy as jnp


def _axis_indices(out_size: int, in_size: int, align_corners: bool, dtype):
    """Source coordinates for 1-D linear interpolation, torch convention."""
    i = jnp.arange(out_size, dtype=dtype)
    if align_corners:
        if out_size == 1:
            src = jnp.zeros((1,), dtype)
        else:
            src = i * (in_size - 1) / (out_size - 1)
    else:
        src = (i + 0.5) * (in_size / out_size) - 0.5
        src = jnp.clip(src, 0.0, in_size - 1)
    i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
    i1 = jnp.clip(i0 + 1, 0, in_size - 1)
    w1 = src - i0.astype(dtype)
    return i0, i1, w1


def resize_bilinear(x: jnp.ndarray, out_hw, align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of [B, H, W, C] to [B, H2, W2, C], torch semantics."""
    b, h, w, c = x.shape
    h2, w2 = out_hw
    if (h2, w2) == (h, w):
        return x
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    y0, y1, wy = _axis_indices(h2, h, align_corners, dtype)
    x0, x1, wx = _axis_indices(w2, w, align_corners, dtype)
    # rows
    top = jnp.take(x, y0, axis=1)
    bot = jnp.take(x, y1, axis=1)
    rows = top + (bot - top) * wy[None, :, None, None]
    # cols
    left = jnp.take(rows, x0, axis=2)
    right = jnp.take(rows, x1, axis=2)
    return left + (right - left) * wx[None, None, :, None]


def resize_nearest(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Nearest resize (torch legacy 'nearest': src = floor(dst * in/out))."""
    b, h, w, c = x.shape
    h2, w2 = out_hw
    iy = jnp.minimum((jnp.arange(h2) * h // h2).astype(jnp.int32), h - 1)
    ix = jnp.minimum((jnp.arange(w2) * w // w2).astype(jnp.int32), w - 1)
    return jnp.take(jnp.take(x, iy, axis=1), ix, axis=2)


def resize_trilinear_depth(vol: jnp.ndarray, out_dhw, align_corners: bool = False) -> jnp.ndarray:
    """Trilinear resize of a depth-sample volume [B, D, H, W] -> [B, D2, H2, W2].

    Used for snapping full-resolution depth hypotheses to stage resolution
    (models/cas_mvsnet.py:292-296). In the shipped configs D2 == D, so the
    depth axis resolves to identity under align_corners=False; the general
    path is kept for completeness.
    """
    b, d, h, w = vol.shape
    d2, h2, w2 = out_dhw
    dtype = vol.dtype
    if d2 != d:
        d0, d1, wd = _axis_indices(d2, d, align_corners, dtype)
        lo = jnp.take(vol, d0, axis=1)
        hi = jnp.take(vol, d1, axis=1)
        vol = lo + (hi - lo) * wd[None, :, None, None]
    # reuse the 2-D path over (H, W) by folding D into channels-last layout
    v = jnp.moveaxis(vol, 1, -1)  # [B, H, W, D2]
    v = resize_bilinear(v, (h2, w2), align_corners)
    return jnp.moveaxis(v, -1, 1)
