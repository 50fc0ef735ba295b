"""Depth-map evaluation metrics + scalar averaging.

Parity with /root/reference/utils.py:103-159: per-image-mean threshold
metrics (fraction of masked pixels with |err| > tau) and banded absolute
depth errors, plus the DictAverageMeter epoch aggregator.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _masked_mean_per_image(value, mask):
    """Mean over masked pixels, computed per image then averaged
    (utils.py:126-137 wrapper semantics)."""
    m = mask.astype(value.dtype)
    num = jnp.sum(value * m, axis=(1, 2))
    den = jnp.maximum(jnp.sum(m, axis=(1, 2)), 1.0)
    return jnp.mean(num / den)


def thres_metrics(depth_est, depth_gt, mask, thres: float):
    """Fraction of masked pixels with abs error > thres (utils.py:139-148)."""
    err = jnp.abs(depth_est - depth_gt)
    return _masked_mean_per_image((err > thres).astype(depth_est.dtype), mask)


def abs_depth_error_metrics(depth_est, depth_gt, mask, thres_band=None):
    """Mean absolute depth error over masked pixels; optional error band
    [lo, hi) restriction (utils.py:151-159)."""
    err = jnp.abs(depth_est - depth_gt)
    m = mask
    if thres_band is not None:
        lo, hi = thres_band
        m = m & (err >= lo) & (err < hi)
    return _masked_mean_per_image(err, m)


class DictAverageMeter:
    """Running mean of scalar dicts (utils.py:103-122)."""

    def __init__(self):
        self.data = {}
        self.count = 0

    def update(self, new_input: dict):
        self.count += 1
        for k, v in new_input.items():
            v = float(v)
            self.data[k] = self.data.get(k, 0.0) + v

    def mean(self):
        return {k: v / self.count for k, v in self.data.items()}
