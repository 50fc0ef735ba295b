"""Unsupervised / self-supervised losses (RC-MVSNet & KD-MVS family).

Capability parity with /root/reference/models/unsup_loss.py (which is
vestigial there — it imports nonexistent modules and cannot run; this is a
working implementation of the same loss family): per-source-view photometric
reconstruction (smooth-L1 + SSIM mix) of the ref image from warped source
images via the estimated depth, top-k selection over views, and an
edge-aware first-order depth smoothness term, aggregated over stages.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from .crossview import inverse_warping


def ssim(x, y, c1: float = 0.01 ** 2, c2: float = 0.03 ** 2):
    """SSIM map via 3x3 average pooling. x, y: [B, H, W, C] in [0, 1].
    Returns the (1 - SSIM)/2 dissimilarity clipped to [0, 1]."""
    pool = lambda v: jax.lax.reduce_window(
        v, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID") / 9.0
    mu_x = pool(x)
    mu_y = pool(y)
    sigma_x = pool(x * x) - mu_x ** 2
    sigma_y = pool(y * y) - mu_y ** 2
    sigma_xy = pool(x * y) - mu_x * mu_y
    ssim_n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    ssim_d = (mu_x ** 2 + mu_y ** 2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.clip((1 - ssim_n / ssim_d) / 2, 0, 1)


def depth_smoothness(depth, img, weight: float = 1.0):
    """Edge-aware first-order smoothness. depth [B, H, W]; img [B, H, W, C]."""
    d = depth[..., None]
    dx = jnp.abs(d[:, :, 1:] - d[:, :, :-1])
    dy = jnp.abs(d[:, 1:, :] - d[:, :-1, :])
    ix = jnp.mean(jnp.abs(img[:, :, 1:] - img[:, :, :-1]), axis=-1, keepdims=True)
    iy = jnp.mean(jnp.abs(img[:, 1:, :] - img[:, :-1, :]), axis=-1, keepdims=True)
    return weight * (jnp.mean(dx * jnp.exp(-ix)) + jnp.mean(dy * jnp.exp(-iy)))


def unsup_reconstruction_loss(depth_est, imgs, cams, top_k: int = 3,
                              w_photo: float = 0.8, w_ssim: float = 0.2):
    """Photometric self-supervision for one stage.

    depth_est [B, h, w]; imgs [B, N, H, W, C]; cams [B, N, 2, 4, 4]
    (stage-scaled). Warps each source image into the reference view via the
    estimated depth and scores against the actual reference image; per-pixel
    top-k (smallest) over source views.
    """
    b, hh, ww = depth_est.shape
    num_views = imgs.shape[1]
    ref_img = resize_bilinear(imgs[:, 0], (hh, ww), align_corners=True)
    ref_cam = cams[:, 0]
    per_view = []
    ssim_total = 0.0
    for view in range(1, num_views):
        view_img = resize_bilinear(imgs[:, view], (hh, ww), align_corners=True)
        warped, mask = inverse_warping(view_img, ref_cam, cams[:, view], depth_est)
        diff = jnp.abs(warped - ref_img) * mask
        ad = jnp.mean(jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5),
                      axis=-1, keepdims=True)  # [B,h,w,1]
        per_view.append(ad + 1e4 * (1.0 - mask))
        ssim_total = ssim_total + jnp.mean(ssim(warped * mask, ref_img * mask))
    vol = jnp.stack(per_view, axis=-1)  # [B,h,w,1,V-1]
    k = min(top_k, vol.shape[-1])
    neg_top, _ = jax.lax.top_k(-vol, k)
    top_vals = -neg_top
    top_mask = (top_vals < 1e4).astype(vol.dtype)
    photo = jnp.mean(jnp.sum(top_vals * top_mask, axis=-1))
    return w_photo * photo + w_ssim * ssim_total / max(num_views - 1, 1)


def unsup_loss(stage_outputs, imgs, cams, dlossw=(0.5, 1.0, 2.0),
               w_smooth: float = 0.18, top_k: int = 3):
    """Multi-stage unsupervised loss: reconstruction + edge-aware smoothness.

    Returns (total, last_stage_reconstr)."""
    total = 0.0
    last = 0.0
    for stage_key in sorted(k for k in stage_outputs if k.startswith("stage")):
        depth_est = stage_outputs[stage_key]["depth"]
        b, hh, ww = depth_est.shape
        stage_idx = int(stage_key.replace("stage", "")) - 1
        rec = unsup_reconstruction_loss(depth_est, imgs, cams[stage_key], top_k)
        ref_small = resize_bilinear(imgs[:, 0], (hh, ww), align_corners=True)
        # normalize depth for scale-invariant smoothness
        dmean = jnp.mean(depth_est, axis=(1, 2), keepdims=True)
        smooth = depth_smoothness(depth_est / (dmean + 1e-7), ref_small)
        w = dlossw[stage_idx] if dlossw is not None else 1.0
        total = total + w * (rec + w_smooth * smooth)
        last = rec
    return total, last
