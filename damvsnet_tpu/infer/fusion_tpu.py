"""TPU-batched geometric-consistency fusion.

The accelerator-native replacement for both the external CUDA ``fusibile``
binary (gipuma.py:170-189) and the CPU numpy dypcd loop: the per-(ref, src)
reprojection round-trip is a dense batched op — backproject, transform,
bilinear-resample the source depth (cv2.remap semantics = zero border),
reproject — vmapped over source views and jitted. Only final compaction
(variable-length vertex lists) happens on host.

Semantics: identical to filter/dypcd.py:98-159 (dynamic thresholds, vote
acceptance) with a ``num_consistent`` fixed-threshold mode covering the
fusibile disp_thresh/num_consistent behavior.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.pairs import read_pair_file
from ..core.pfm import read_pfm
from ..core.ply import write_ply
from ..ops.warp import bilinear_sample_zeros
from .fusion_dypcd import read_camera_parameters
from .tank_config import TANK_CFG

_HP = jax.lax.Precision.HIGHEST


@functools.partial(jax.jit, static_argnames=("dyn_lo", "dyn_hi"))
def _consistency_one_src(depth_ref, intr_ref, ext_ref, depth_src, intr_src,
                         ext_src, dist_base, rel_diff_base,
                         dyn_lo: int = 2, dyn_hi: int = 11):
    """One (ref, src) round trip. depth_* [H, W]. Returns
    (masks [T,H,W] for thresholds dyn_lo..dyn_hi, final mask [H,W],
    reprojected depth [H,W])."""
    h, w = depth_ref.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    ones = jnp.ones_like(xs)
    pix = jnp.stack([xs.ravel(), ys.ravel(), ones.ravel()])  # [3, HW]

    # ref pixel -> world -> src pixel
    xyz_ref = jnp.matmul(jnp.linalg.inv(intr_ref), pix, precision=_HP) \
        * depth_ref.ravel()[None]
    rel = jnp.matmul(ext_src, jnp.linalg.inv(ext_ref), precision=_HP)
    xyz_src = jnp.matmul(rel[:3, :3], xyz_ref, precision=_HP) + rel[:3, 3:4]
    k_xyz = jnp.matmul(intr_src, xyz_src, precision=_HP)
    xy_src = k_xyz[:2] / k_xyz[2:3]

    # bilinear-resample the source depth (cv2.remap zero-border semantics)
    sampled = bilinear_sample_zeros(
        depth_src[None, :, :, None], xy_src[0][None], xy_src[1][None])[0, :, 0]

    # src pixel + sampled depth -> world -> ref pixel
    xyz_src2 = jnp.matmul(jnp.linalg.inv(intr_src),
                          jnp.concatenate([xy_src, ones.reshape(1, -1)]),
                          precision=_HP) * sampled[None]
    rel_back = jnp.matmul(ext_ref, jnp.linalg.inv(ext_src), precision=_HP)
    xyz_reproj = jnp.matmul(rel_back[:3, :3], xyz_src2, precision=_HP) \
        + rel_back[:3, 3:4]
    depth_reproj = xyz_reproj[2].reshape(h, w)
    k_reproj = jnp.matmul(intr_ref, xyz_reproj, precision=_HP)
    z = jnp.where(k_reproj[2:3] == 0, k_reproj[2:3] + 1e-5, k_reproj[2:3])
    xy_reproj = k_reproj[:2] / z

    dist = jnp.sqrt((xy_reproj[0].reshape(h, w) - xs) ** 2
                    + (xy_reproj[1].reshape(h, w) - ys) ** 2)
    rel_diff = jnp.abs(depth_reproj - depth_ref) / depth_ref

    thresholds = jnp.arange(dyn_lo, dyn_hi, dtype=jnp.float32)
    masks = ((dist[None] < thresholds[:, None, None] * dist_base)
             & (rel_diff[None] < thresholds[:, None, None] * rel_diff_base))
    final_mask = masks[-1]
    depth_reproj = jnp.where(final_mask, depth_reproj, 0.0)
    return masks, final_mask, depth_reproj


_consistency_batch = jax.jit(
    jax.vmap(_consistency_one_src, in_axes=(None, None, None, 0, 0, 0, None, None)),
    static_argnames=(),
)


def fuse_reference_view(depth_ref, intr_ref, ext_ref, src_depths, src_intrs,
                        src_exts, dist_base=0.25, rel_diff_base=1.0 / 1300,
                        num_consistent=None):
    """Vote-fuse one reference view against V sources (device-side).

    One consistency pass serves both acceptance modes: the dynamic dypcd
    vote (filter/dypcd.py:240-252) by default, or — with num_consistent
    set — the fixed gipuma-style threshold (geo_mask_sum >= n,
    gipuma.py:170-189). Returns (geo_mask [H,W] bool, fused depth [H,W])
    as numpy.
    """
    masks, final, reproj = _consistency_batch(
        jnp.asarray(depth_ref), jnp.asarray(intr_ref), jnp.asarray(ext_ref),
        jnp.asarray(src_depths), jnp.asarray(src_intrs), jnp.asarray(src_exts),
        dist_base, rel_diff_base)
    # masks: [V, T, H, W]; final: [V, H, W]; reproj: [V, H, W]
    geo_mask_sum = jnp.sum(final.astype(jnp.int32), axis=0)
    depth_avg = (jnp.sum(reproj, axis=0) + depth_ref) / (geo_mask_sum + 1)
    if num_consistent is not None:
        geo_mask = geo_mask_sum >= num_consistent
    else:
        nviews = src_depths.shape[0] + 1
        geo_mask = geo_mask_sum >= nviews
        mask_sums = jnp.sum(masks.astype(jnp.int32), axis=0)  # [T, H, W]
        for i in range(2, nviews):
            geo_mask = geo_mask | (mask_sums[i - 2] >= i)
    return np.asarray(geo_mask), np.asarray(depth_avg)


def consistency_filter(datapath, outdir, testlist, conf=(0.1, 0.15, 0.9),
                       dist_base=0.25, rel_diff_base=1.0 / 1300,
                       num_consistent=None, log_fn=print):
    """All-scene TPU-batched fusion. With num_consistent set, uses the
    fixed gipuma-style acceptance (geo_mask_sum >= num_consistent) instead
    of the dynamic vote."""
    from PIL import Image
    for scene in testlist:
        scene_conf = conf
        if scene in TANK_CFG["scenes"]:
            scene_conf = TANK_CFG[scene]["conf"]
        pair_data = read_pair_file(os.path.join(datapath, scene, "pair.txt"))
        scan_folder = os.path.join(outdir, scene)
        vertexs, vertex_colors = [], []

        # preload all cams + depths once per scene
        cams = {}
        depths = {}
        views = sorted({v for r, s in pair_data for v in [r] + s})
        for v in views:
            cams[v] = read_camera_parameters(
                os.path.join(scan_folder, f"cams/{v:0>8}_cam.txt"))
            depths[v] = read_pfm(
                os.path.join(scan_folder, f"depth_est/{v:0>8}.pfm"))[0]

        for ref_view, src_views in pair_data:
            ref_intr, ref_ext = cams[ref_view]
            ref_depth = depths[ref_view]
            c3 = read_pfm(os.path.join(
                scan_folder, f"confidence/{ref_view:0>8}.pfm"))[0]
            c2 = read_pfm(os.path.join(
                scan_folder, f"confidence/{ref_view:0>8}_stage2.pfm"))[0]
            c1 = read_pfm(os.path.join(
                scan_folder, f"confidence/{ref_view:0>8}_stage1.pfm"))[0]
            photo_mask = ((c3 > scene_conf[2]) & (c2 > scene_conf[1])
                          & (c1 > scene_conf[0]))

            src_depths = np.stack([depths[v] for v in src_views])
            src_intrs = np.stack([cams[v][0] for v in src_views])
            src_exts = np.stack([cams[v][1] for v in src_views])
            geo_mask, depth_avg = fuse_reference_view(
                ref_depth, ref_intr, ref_ext, src_depths, src_intrs, src_exts,
                dist_base, rel_diff_base, num_consistent=num_consistent)

            final_mask = photo_mask & geo_mask
            h, w = depth_avg.shape
            x, y = np.meshgrid(np.arange(w), np.arange(h))
            x, y, depth = x[final_mask], y[final_mask], depth_avg[final_mask]
            ref_img = np.asarray(Image.open(
                os.path.join(scan_folder, f"images/{ref_view:0>8}.jpg")),
                dtype=np.float32) / 255.0
            color = ref_img[final_mask]
            xyz_ref = np.matmul(np.linalg.inv(ref_intr),
                                np.vstack((x, y, np.ones_like(x))) * depth)
            xyz_world = np.matmul(np.linalg.inv(ref_ext),
                                  np.vstack((xyz_ref, np.ones_like(x))))[:3]
            vertexs.append(xyz_world.T)
            vertex_colors.append((color * 255).astype(np.uint8))

        vertexs = np.concatenate(vertexs, axis=0)
        vertex_colors = np.concatenate(vertex_colors, axis=0)
        ply_path = os.path.join(outdir, f"{scene}.ply")
        write_ply(ply_path, vertexs, vertex_colors)
        log_fn(f"saved {len(vertexs)} points to {ply_path}")
