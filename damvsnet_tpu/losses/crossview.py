"""Cross-view photometric-consistency (CPC) loss.

Parity with the reference (models/module.py:624-691 and
models/homography.py:7-201): each source image is warped into the reference
frame twice — once with the estimated depth and once with GT depth — and a
smooth-L1 between the two warps is aggregated per pixel with a top-2
(smallest over source views) selection; invalid (un-warpable) pixels are
pushed out of the top-k with a 1e4 penalty.

The reference's ``_bilinear_sample`` validity mask checks
``(x0>=0) & (x1<=W-1) & (y0>=0) & (y0<=H-1)`` — note y1 is *not* checked
(y0 appears twice); this quirk is reproduced since it shifts mask coverage
on the bottom edge.

Layouts: imgs [B, N, H, W, C]; cams {stage: [B, N, 2, 4, 4]} (extrinsics,
K-padded); depth maps [B, h, w].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear


def _bilinear_sample_border(img, px, py):
    """Clamped bilinear sample + reference-quirk validity mask.

    img [B, H, W, C]; px, py [B, H', W'] absolute pixel coords.
    Returns (sampled [B, H', W', C], mask [B, H', W', 1]).
    """
    b, h, w, c = img.shape
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    x1 = x0 + 1
    y1 = y0 + 1
    mask = ((x0 >= 0) & (x1 <= w - 1) & (y0 >= 0) & (y0 <= h - 1))
    mask = mask.astype(img.dtype)[..., None]

    x0c = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
    x1c = jnp.clip(x1, 0, w - 1).astype(jnp.int32)
    y0c = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
    y1c = jnp.clip(y1, 0, h - 1).astype(jnp.int32)

    flat = img.reshape(b, h * w, c)

    def tap(yi, xi):
        idx = (yi * w + xi).reshape(b, -1)
        return jnp.take_along_axis(flat, idx[..., None], axis=1).reshape(
            b, px.shape[1], px.shape[2], c)

    wa = ((x1 - px) * (y1 - py))[..., None]
    wb = ((x1 - px) * (1.0 - (y1 - py)))[..., None]
    wc = ((1.0 - (x1 - px)) * (y1 - py))[..., None]
    wd = ((1.0 - (x1 - px)) * (1.0 - (y1 - py)))[..., None]
    out = (wa * tap(y0c, x0c) + wb * tap(y1c, x0c)
           + wc * tap(y0c, x1c) + wd * tap(y1c, x1c))
    return out, mask


def inverse_warping(img, left_cam, right_cam, depth):
    """Warp a source image into the reference frame via the estimated depth.

    img: [B, h, w, C] (source view, already at depth-map resolution);
    left_cam / right_cam: [B, 2, 4, 4] reference / source cameras;
    depth: [B, h, w] reference-frame depth.
    Returns (warped [B, h, w, C], mask [B, h, w, 1]).
    """
    b, h, w, _ = img.shape
    r_left = left_cam[:, 0, :3, :3]
    r_right = right_cam[:, 0, :3, :3]
    t_left = left_cam[:, 0, :3, 3:4]
    t_right = right_cam[:, 0, :3, 3:4]
    k_left = left_cam[:, 1, :3, :3]

    hp = jax.lax.Precision.HIGHEST  # camera math at full fp32 precision
    k_left_inv = jnp.linalg.inv(k_left)
    r_rel = jnp.matmul(r_right, jnp.swapaxes(r_left, 1, 2), precision=hp)
    t_rel = t_right - jnp.matmul(r_rel, t_left, precision=hp)

    # pixel grid in absolute coordinates (homography.py:66-83)
    xs = jnp.arange(w, dtype=img.dtype)
    ys = jnp.arange(h, dtype=img.dtype)
    gx, gy = jnp.meshgrid(xs, ys)  # [h, w]
    grid = jnp.stack([gx.ravel(), gy.ravel(), jnp.ones(h * w, img.dtype)])  # [3, hw]

    cam_coords = jnp.matmul(k_left_inv, grid[None], precision=hp) \
        * depth.reshape(b, 1, h * w)
    cam_hom = jnp.concatenate(
        [cam_coords, jnp.ones((b, 1, h * w), img.dtype)], axis=1)

    # K-homogeneous @ relative transform (homography.py:52-58)
    transform = jnp.concatenate([
        jnp.concatenate([r_rel, t_rel], axis=2),
        jnp.broadcast_to(jnp.array([[0., 0., 0., 1.]], img.dtype), (b, 1, 4)),
    ], axis=1)
    k_hom = jnp.concatenate([
        jnp.concatenate([k_left, jnp.zeros((b, 3, 1), img.dtype)], axis=2),
        jnp.broadcast_to(jnp.array([[0., 0., 0., 1.]], img.dtype), (b, 1, 4)),
    ], axis=1)
    proj = jnp.matmul(k_hom, transform, precision=hp)

    pcoords = jnp.matmul(proj, cam_hom, precision=hp)  # [B, 4, hw]
    z = pcoords[:, 2:3]
    px = (pcoords[:, 0:1] / (z + 1e-10)).reshape(b, h, w)
    py = (pcoords[:, 1:2] / (z + 1e-10)).reshape(b, h, w)
    return _bilinear_sample_border(img, px, py)


def compute_reconstr_loss(warped, ref, mask):
    """Masked smooth-L1 averaged over every element (module.py:618-620)."""
    diff = warped * mask - ref * mask
    ad = jnp.abs(diff)
    return jnp.mean(jnp.where(ad < 1.0, 0.5 * diff * diff, ad - 0.5))


def cross_view_loss(stage_outputs, imgs, cams, depth_gt_ms, depth_loss_weights):
    """Total CPC loss over stages (module.py:624-691).

    stage_outputs: {"stageK": {"depth": [B,h,w], ...}};
    imgs [B, N, H, W, C]; cams {"stageK": [B, N, 2, 4, 4]};
    depth_gt_ms {"stageK": [B, h, w]}.
    """
    num_views = imgs.shape[1]
    total = 0.0
    for stage_key in sorted(k for k in stage_outputs if k.startswith("stage")):
        depth_est = stage_outputs[stage_key]["depth"]
        depth_gt = depth_gt_ms[stage_key]
        b, hh, ww = depth_est.shape
        ref_cam = cams[stage_key][:, 0]
        per_view = []
        for view in range(1, num_views):
            view_cam = cams[stage_key][:, view]
            view_img = resize_bilinear(imgs[:, view], (hh, ww), align_corners=True)
            warped_est, mask_est = inverse_warping(view_img, ref_cam, view_cam, depth_est)
            warped_gt, mask_gt = inverse_warping(view_img, ref_cam, view_cam, depth_gt)
            mask = mask_est * mask_gt
            reconstr = compute_reconstr_loss(warped_est, warped_gt, mask)
            per_view.append(reconstr + 1e4 * (1.0 - mask))  # [B,h,w,1]
        vol = jnp.stack(per_view, axis=-1)  # [B,h,w,1,V-1]
        k = min(2, vol.shape[-1])
        neg_top, _ = jax.lax.top_k(-vol, k)  # top-k smallest entries
        top_vals = -neg_top
        top_mask = (top_vals < 1e4).astype(vol.dtype)
        top_vals = top_vals * top_mask
        stage_loss = jnp.mean(jnp.sum(top_vals, axis=-1))
        stage_idx = int(stage_key.replace("stage", "")) - 1
        total = total + stage_loss * depth_loss_weights[stage_idx]
    return total
