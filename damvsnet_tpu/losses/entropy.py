"""Entropy-family losses (TransMVSNet lineage).

Parity with /root/reference/models/module.py:745-851:
  * info_entropy_loss  (:745-752)
  * entropy_loss       (:755-790): cross-entropy vs one-hot GT depth index,
    plus the winner-take-all depth map.
  * focal_loss_bld     (:820-851): staged entropy loss + BlendedMVS EPE /
    <1px / <3px metrics scaled by depth_interval * 192/128.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .supervised import masked_smooth_l1


def info_entropy_loss(prob_volume, prob_volume_pre, mask):
    """Masked mean entropy of the probability volume (module.py:745-752)."""
    log_sm = jax.nn.log_softmax(prob_volume_pre, axis=1)
    valid = jnp.sum(mask, axis=(1, 2)) + 1e-6
    entropy = -jnp.sum(prob_volume * log_sm, axis=1)  # [B,H,W]
    masked = jnp.sum(mask * entropy, axis=(1, 2))
    return jnp.mean(masked / valid)


def entropy_loss(prob_volume, depth_gt, mask, depth_values):
    """Cross-entropy against the nearest-hypothesis one-hot GT index.

    prob_volume [B,D,H,W]; depth_gt [B,H,W]; mask [B,H,W] float 0/1;
    depth_values [B,D] or [B,D,H,W].
    Returns (masked_ce, wta_depth_map).
    """
    b, d, h, w = prob_volume.shape
    valid_count = jnp.sum(mask, axis=(1, 2)) + 1e-6
    dv = depth_values if depth_values.ndim == 4 else \
        jnp.broadcast_to(depth_values[:, :, None, None], (b, d, h, w))
    gt_index = jnp.argmin(jnp.abs(dv - depth_gt[:, None]), axis=1)  # [B,H,W]
    # mask -> zero index on invalid pixels, rounded like the reference
    gt_index = jnp.round(mask * gt_index.astype(mask.dtype)).astype(jnp.int32)
    gt_onehot = jax.nn.one_hot(gt_index, d, axis=1, dtype=prob_volume.dtype)
    ce = -jnp.sum(gt_onehot * jnp.log(prob_volume + 1e-6), axis=1)  # [B,H,W]
    masked_ce = jnp.sum(mask * ce, axis=(1, 2))
    masked_ce = jnp.mean(masked_ce / valid_count)
    wta_index = jnp.argmax(prob_volume, axis=1)
    wta_depth = jnp.take_along_axis(dv, wta_index[:, None], axis=1)[:, 0]
    return masked_ce, wta_depth


def focal_loss_bld(stage_outputs, depth_gt_ms, mask_ms, depth_interval,
                   dlossw=(0.5, 1.0, 2.0), entropy_weight: float = 2.0):
    """Staged entropy loss + BlendedMVS-normalized error metrics.

    Returns (total_loss, last_depth_loss, epe, less1, less3).
    """
    total = 0.0
    depth_loss = 0.0
    for stage_key in sorted(k for k in stage_outputs if k.startswith("stage")):
        so = stage_outputs[stage_key]
        mask = (mask_ms[stage_key] > 0.5).astype(so["prob_volume"].dtype)
        entro, wta_depth = entropy_loss(
            so["prob_volume"], depth_gt_ms[stage_key], mask, so["depth_values"])
        entro = entro * entropy_weight
        depth_loss = masked_smooth_l1(wta_depth, depth_gt_ms[stage_key], mask)
        stage_idx = int(stage_key.replace("stage", "")) - 1
        w = dlossw[stage_idx] if dlossw is not None else 1.0
        total = total + w * entro

    last = f"stage{len([k for k in stage_outputs if k.startswith('stage')])}"
    abs_err = jnp.abs(depth_gt_ms[last] - stage_outputs[last]["depth"])
    abs_err_scaled = abs_err / (depth_interval * 192.0 / 128.0)
    mask = (mask_ms[last] > 0.5).astype(abs_err.dtype)
    cnt = jnp.maximum(jnp.sum(mask), 1.0)
    epe = jnp.sum(abs_err_scaled * mask) / cnt
    less1 = jnp.sum((abs_err_scaled < 1.0) * mask) / cnt
    less3 = jnp.sum((abs_err_scaled < 3.0) * mask) / cnt
    return total, depth_loss, epe, less1, less3
