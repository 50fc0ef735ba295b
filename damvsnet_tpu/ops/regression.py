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
    """4-tap window sum gathered at the soft argmax index (no gradient).

    The gather is re-expressed as a masked reduction (gathers are
    per-index-overhead-bound on TPU, PERF.md):
    sum4[idx] == sum_d p[d] * 1[idx-1 <= d <= idx+2] — identical values.
    """
    prob_volume = jax.lax.stop_gradient(prob_volume)
    b, d, h, w = prob_volume.shape
    d_iota = jnp.arange(d, dtype=prob_volume.dtype)[None, :, None, None]
    idx_f = jnp.sum(prob_volume * d_iota, axis=1)
    idx = jnp.clip(idx_f.astype(jnp.int32), 0, d - 1)  # trunc, matches .long()
    idx = idx[:, None].astype(prob_volume.dtype)
    window = ((d_iota >= idx - 1) & (d_iota <= idx + 2)).astype(prob_volume.dtype)
    return jnp.sum(prob_volume * window, axis=1)


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
