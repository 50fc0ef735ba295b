"""Supervised staged depth loss (+ CPC composition).

Parity with ``cas_mvsnet_loss`` (/root/reference/models/module.py:695-719):
per-stage masked smooth-L1 (mask > 0.5) weighted by dlossw (0.5, 1, 2) plus
12x the cross-view photometric-consistency loss.
"""
from __future__ import annotations

import jax.numpy as jnp

from .crossview import cross_view_loss

CPC_WEIGHT = 12.0


def smooth_l1(pred, target):
    """Elementwise smooth-L1 (beta = 1, torch default)."""
    diff = pred - target
    ad = jnp.abs(diff)
    return jnp.where(ad < 1.0, 0.5 * diff * diff, ad - 0.5)


def masked_smooth_l1(pred, target, mask):
    """Mean smooth-L1 over mask-selected elements (matches torch boolean
    indexing + reduction='mean')."""
    m = mask.astype(pred.dtype)
    total = jnp.sum(smooth_l1(pred, target) * m)
    count = jnp.maximum(jnp.sum(m), 1.0)
    return total / count


def cas_mvsnet_loss(stage_outputs, imgs, cams, depth_gt_ms, mask_ms,
                    dlossw=(0.5, 1.0, 2.0), cpc_weight: float = CPC_WEIGHT,
                    use_cpc: bool = True):
    """Returns (total_loss, last_stage_depth_loss, cpc_loss).

    stage_outputs: {"stageK": {"depth": ...}}; imgs [B,N,H,W,C];
    cams {"stageK": [B,N,2,4,4]}; depth_gt_ms / mask_ms {"stageK": [B,h,w]}.
    """
    total_depth_loss = 0.0
    depth_loss = 0.0
    for stage_key in sorted(k for k in stage_outputs if k.startswith("stage")):
        depth_est = stage_outputs[stage_key]["depth"]
        depth_gt = depth_gt_ms[stage_key]
        mask = mask_ms[stage_key] > 0.5
        depth_loss = masked_smooth_l1(depth_est, depth_gt, mask)
        stage_idx = int(stage_key.replace("stage", "")) - 1
        w = dlossw[stage_idx] if dlossw is not None else 1.0
        total_depth_loss = total_depth_loss + w * depth_loss

    if use_cpc:
        cpc = cross_view_loss(stage_outputs, imgs, cams, depth_gt_ms,
                              dlossw if dlossw is not None else (1.0, 1.0, 1.0))
    else:
        cpc = jnp.asarray(0.0)
    total = total_depth_loss + cpc * cpc_weight
    return total, depth_loss, cpc
