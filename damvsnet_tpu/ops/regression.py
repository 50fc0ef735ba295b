"""Probability-volume post-processing: soft-argmin depth, photometric
confidence, and the 3-sigma uncertainty band.

Parity with /root/reference/models/cas_mvsnet.py:105-124:
  * prob_volume = softmax_D(cost_reg)
  * depth       = sum_D p * d                        (soft-argmin)
  * confidence  = (4-tap sliding window sum of p along D, padded (1, 2)
                   with zeros) gathered at round-toward-zero soft argmax
                   index of arange(D); no gradient.
  * sigma       = 3 * sqrt(sum_D p * (d - depth)^2)

These four reductions share one pass over the [B, D, H, W] volume; a Pallas
kernel fuses them on TPU (ops/pallas/probstats.py); this module is the XLA
reference implementation and the CPU path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def depth_regression(p: jnp.ndarray, depth_values: jnp.ndarray) -> jnp.ndarray:
    """Soft-argmin: p [B, D, H, W]; depth_values [B, D] or [B, D, H, W]."""
    if depth_values.ndim <= 2:
        depth_values = depth_values[:, :, None, None]
    return jnp.sum(p * depth_values, axis=1)


def photometric_confidence(prob_volume: jnp.ndarray) -> jnp.ndarray:
    """4-tap window sum gathered at the soft argmax index (no gradient)."""
    prob_volume = jax.lax.stop_gradient(prob_volume)
    b, d, h, w = prob_volume.shape
    padded = jnp.pad(prob_volume, ((0, 0), (1, 2), (0, 0), (0, 0)))
    # sliding sum of 4 along D: sum4[k] = p[k-1] + p[k] + p[k+1] + p[k+2]
    csum = jnp.cumsum(padded, axis=1)
    csum = jnp.pad(csum, ((0, 0), (1, 0), (0, 0), (0, 0)))
    sum4 = csum[:, 4:, :, :] - csum[:, :-4, :, :]  # [B, D, H, W]
    idx_f = jnp.sum(prob_volume * jnp.arange(d, dtype=prob_volume.dtype)[None, :, None, None], axis=1)
    idx = jnp.clip(idx_f.astype(jnp.int32), 0, d - 1)  # trunc toward zero, matches .long()
    return jnp.take_along_axis(sum4, idx[:, None, :, :], axis=1)[:, 0]


def prob_volume_stats(prob_volume_pre: jnp.ndarray, depth_values: jnp.ndarray):
    """Softmax + soft-argmin depth + confidence + 3-sigma band in one call.

    prob_volume_pre: [B, D, H, W] raw regularized cost (pre-softmax).
    depth_values:    [B, D] or [B, D, H, W].
    Returns dict(depth [B,H,W], photometric_confidence [B,H,W],
                 variance [B,H,W] (the 3-sigma band), prob_volume [B,D,H,W]).
    """
    prob_volume = jax.nn.softmax(prob_volume_pre, axis=1)
    depth = depth_regression(prob_volume, depth_values)
    conf = photometric_confidence(prob_volume)
    dv = depth_values if depth_values.ndim == 4 else depth_values[:, :, None, None]
    samp_var = (dv - depth[:, None]) ** 2
    sigma3 = 3.0 * jnp.sqrt(jnp.sum(samp_var * prob_volume, axis=1))
    return {
        "depth": depth,
        "photometric_confidence": conf,
        "variance": sigma3,
        "prob_volume": prob_volume,
    }
