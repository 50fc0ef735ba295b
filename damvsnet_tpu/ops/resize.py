"""Image resizing with exact torch ``F.interpolate`` semantics.

The reference pipeline leans on three distinct resamplers whose conventions
must match to keep numerics:
  * bilinear, align_corners=False  — stage handoff upsampling of depth/conf
    (models/cas_mvsnet.py:220-253)
  * bilinear, align_corners=True   — CPC loss source-image scaling
    (models/module.py:656)
  * nearest (legacy torch)         — FPN top-down x2 upsampling
    (models/module.py:447-452)

TPU note: gather ops are per-index-overhead-bound on TPU (PERF.md), so all
integer-factor cases — every resize on the model's hot path — are computed
with closed-form slice/stack arithmetic (identical values to torch, pinned
by tests/test_ops_parity.py); only arbitrary-ratio cases fall back to the
index-gather formulation. All functions take NHWC ([B, H, W, C]) arrays.
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


def _shift_prev(x, axis):
    """x[k-1] with edge clamp along axis."""
    first, rest = jnp.split(x, [1], axis=axis)
    head = jnp.split(x, [x.shape[axis] - 1], axis=axis)[0]
    return jnp.concatenate([first, head], axis=axis)


def _shift_next(x, axis):
    """x[k+1] with edge clamp along axis."""
    last = jnp.split(x, [x.shape[axis] - 1], axis=axis)[1]
    rest = jnp.split(x, [1], axis=axis)[1]
    return jnp.concatenate([rest, last], axis=axis)


def _upsample_int_linear(x, axis: int, factor: int):
    """Exact torch bilinear (align_corners=False) integer-factor upsample
    along one axis: out[f*k + p] = lerp with offset (p+0.5)/f - 0.5."""
    dtype = x.dtype
    xm = _shift_prev(x, axis)
    xp = _shift_next(x, axis)
    phases = []
    for p in range(factor):
        o = (p + 0.5) / factor - 0.5
        if o < 0:
            w = jnp.asarray(-o, dtype)  # weight on x[k-1]
            phases.append(w * xm + (1 - w) * x)
        else:
            w = jnp.asarray(o, dtype)  # weight on x[k+1]
            phases.append((1 - w) * x + w * xp)
    stacked = jnp.stack(phases, axis=axis + 1)  # [..., in, f, ...]
    new_shape = x.shape[:axis] + (x.shape[axis] * factor,) + x.shape[axis + 1:]
    return stacked.reshape(new_shape)


def _downsample_int_linear(x, axis: int, factor: int):
    """Exact torch bilinear (align_corners=False) integer-factor downsample:
    src = f*k + (f-1)/2 — a point sample (odd f) or pair average (even f)."""
    n = x.shape[axis]
    out = n // factor
    lead = x.shape[:axis]
    tail = x.shape[axis + 1:]
    xg = x.reshape(lead + (out, factor) + tail)
    mid = (factor - 1) // 2
    if factor % 2 == 1:
        return jnp.take(xg, mid, axis=axis + 1)
    a = jnp.take(xg, mid, axis=axis + 1)
    b = jnp.take(xg, mid + 1, axis=axis + 1)
    return 0.5 * (a + b)


def _axis_linear(x, axis: int, out_size: int, align_corners: bool):
    """1-D linear resize along `axis` (torch semantics)."""
    in_size = x.shape[axis]
    if out_size == in_size:
        return x
    if not align_corners:
        if out_size % in_size == 0:
            return _upsample_int_linear(x, axis, out_size // in_size)
        if in_size % out_size == 0:
            return _downsample_int_linear(x, axis, in_size // out_size)
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    i0, i1, w1 = _axis_indices(out_size, in_size, align_corners, dtype)
    lo = jnp.take(x, i0, axis=axis)
    hi = jnp.take(x, i1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    return lo + (hi - lo) * w1.reshape(shape)


def resize_bilinear(x: jnp.ndarray, out_hw, align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of [B, H, W, C] to [B, H2, W2, C], torch semantics."""
    b, h, w, c = x.shape
    h2, w2 = out_hw
    if (h2, w2) == (h, w):
        return x
    x = _axis_linear(x, 1, h2, align_corners)
    return _axis_linear(x, 2, w2, align_corners)


def resize_nearest(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Nearest resize (torch legacy 'nearest': src = floor(dst * in/out))."""
    b, h, w, c = x.shape
    h2, w2 = out_hw

    def axis_nearest(v, axis, out_size):
        in_size = v.shape[axis]
        if out_size == in_size:
            return v
        if out_size % in_size == 0:
            return jnp.repeat(v, out_size // in_size, axis=axis)
        if in_size % out_size == 0:
            f = in_size // out_size
            lead = v.shape[:axis]
            tail = v.shape[axis + 1:]
            return jnp.take(v.reshape(lead + (out_size, f) + tail), 0,
                            axis=axis + 1)
        idx = jnp.minimum((jnp.arange(out_size) * in_size // out_size)
                          .astype(jnp.int32), in_size - 1)
        return jnp.take(v, idx, axis=axis)

    x = axis_nearest(x, 1, h2)
    return axis_nearest(x, 2, w2)


def resize_trilinear_depth(vol: jnp.ndarray, out_dhw, align_corners: bool = False) -> jnp.ndarray:
    """Trilinear resize of a depth-sample volume [B, D, H, W] -> [B, D2, H2, W2].

    Used for snapping full-resolution depth hypotheses to stage resolution
    (models/cas_mvsnet.py:292-296). In the shipped configs D2 == D, so the
    depth axis resolves to identity under align_corners=False; the general
    path is kept for completeness.
    """
    b, d, h, w = vol.shape
    d2, h2, w2 = out_dhw
    # same-size axes are exact identities under torch semantics — skip the
    # take/lerp (stage-3 snap is fully identity at eval resolution)
    if d2 != d:
        vol = _axis_linear(vol, 1, d2, align_corners)
    if h2 != h:
        vol = _axis_linear(vol, 2, h2, align_corners)
    if w2 != w:
        vol = _axis_linear(vol, 3, w2, align_corners)
    return vol
