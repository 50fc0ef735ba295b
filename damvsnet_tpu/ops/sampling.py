"""Depth-hypothesis samplers: uniform (stage 1) and uncertainty-aware ADIA.

Parity with the reference ``uncertainty_aware_samples``
(/root/reference/models/module.py:999-1038):

  stage 1 (cur_depth is [B, D0]):
     uniform D samples from cur_depth[:,0] to cur_depth[:,-1], broadcast
     over the full-resolution [H, W] grid.

  stage >= 2 (cur_depth [B, 1, H, W], sigma = exp_var [B, 1, H, W]):
     low  = -min(cur_depth, sigma)          (keeps samples positive)
     high = sigma
     step = (high - low) / (D - 1)
     base_i   = cur_depth + low + step*i + eps
     zscore_i = 3 * (low + step*i) / (sigma + eps)
     offset   = softmax_D(zscore)           (adaptive interval reweighting)
     sample_i = base_i + offset_i * step
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-12


def uniform_depth_samples(depth_values: jnp.ndarray, ndepth: int, height: int,
                          width: int) -> jnp.ndarray:
    """[B, D0] depth range -> [B, D, H, W] uniform samples.

    Matches models/module.py:1003-1010 (uses first/last entries only).
    """
    dmin = depth_values[:, 0]
    dmax = depth_values[:, -1]
    interval = (dmax - dmin) / (ndepth - 1)
    d = dmin[:, None] + jnp.arange(ndepth, dtype=depth_values.dtype)[None, :] * interval[:, None]
    return jnp.broadcast_to(d[:, :, None, None], (d.shape[0], ndepth, height, width))


def adaptive_depth_samples(cur_depth: jnp.ndarray, sigma: jnp.ndarray,
                           ndepth: int) -> jnp.ndarray:
    """ADIA sampling for stages >= 2.

    cur_depth, sigma: [B, 1, H, W] (previous-stage depth and 3sigma band,
    upsampled to full resolution). Returns [B, D, H, W].
    Matches models/module.py:1012-1038.
    """
    low = -jnp.minimum(cur_depth, sigma)  # [B,1,H,W]
    high = sigma
    step = (high - low) / (float(ndepth) - 1)
    i = jnp.arange(ndepth, dtype=cur_depth.dtype).reshape(1, ndepth, 1, 1)
    ramp = low + step * i  # [B,D,H,W]
    base = cur_depth + ramp + EPS
    zscore = 3.0 * ramp / (sigma + EPS)
    offset = jax.nn.softmax(zscore, axis=1)
    return base + offset * step


def uncertainty_aware_samples(cur_depth: jnp.ndarray, sigma: jnp.ndarray | None,
                              ndepth: int, height: int, width: int) -> jnp.ndarray:
    """Dispatch on stage: [B, D0] -> uniform; [B, 1, H, W] -> ADIA."""
    if cur_depth.ndim == 2:
        return uniform_depth_samples(cur_depth, ndepth, height, width)
    assert sigma is not None
    return adaptive_depth_samples(cur_depth, sigma, ndepth)


def get_cur_depth_range_samples(cur_depth: jnp.ndarray, ndepth: int,
                                depth_interval_pixel) -> jnp.ndarray:
    """Legacy CasMVSNet fixed-interval sampler for stages >= 2
    (parity: models/module.py:911-928): uniform band of
    ndepth * interval centered on the previous depth.
    cur_depth [B, H, W] -> [B, D, H, W]."""
    lo = cur_depth - ndepth / 2 * depth_interval_pixel
    hi = cur_depth + ndepth / 2 * depth_interval_pixel
    new_interval = (hi - lo) / (ndepth - 1)
    i = jnp.arange(ndepth, dtype=cur_depth.dtype).reshape(1, ndepth, 1, 1)
    return lo[:, None] + i * new_interval[:, None]


def get_depth_range_samples(cur_depth: jnp.ndarray, ndepth: int,
                            depth_interval_pixel, height: int,
                            width: int) -> jnp.ndarray:
    """Legacy dispatcher (parity: models/module.py:931-950): [B, D0] ->
    uniform broadcast; [B, H, W] -> fixed-interval band."""
    if cur_depth.ndim == 2:
        return uniform_depth_samples(cur_depth, ndepth, height, width)
    return get_cur_depth_range_samples(cur_depth, ndepth, depth_interval_pixel)
