"""Procedural multi-view scene generator for hermetic tests and benchmarks.

Renders a slanted textured world plane from an N-camera rig with exact
analytic ground-truth depth — every image is geometrically consistent, so
plane-sweep matching, training smoke tests, and fusion can be exercised
without DTU on disk. Output dict layout matches the DTU loader.
"""
from __future__ import annotations

import os

import numpy as np

from ..core.cameras import stage_intrinsics, stage_proj_matrices


def _texture(wx, wy):
    # low-frequency base + mid-frequency detail bands: photometric
    # matching precision scales with texture gradient, and the original
    # few-cycles-per-image bands capped the achievable depth accuracy at
    # ~0.8 stage intervals regardless of kernel correctness (the
    # ACCURACY harness then measures the texture, not the framework).
    # Band frequencies stay below the stage-2 (half-res) Nyquist of the
    # default rigs so pyramid matching stays well-posed.
    # detail bands capped at |k| ~ 17 rad/unit: the stage-1 (quarter-res)
    # pixel footprint at the default rigs is ~0.17 world units, Nyquist
    # k ~ 19 — the first texture revision used bands up to 26 which
    # ALIASED at stage 1 (the renderer is point-sampled, no prefilter),
    # measurably degrading the coarse depth seeds
    r = (0.5 + 0.17 * np.sin(3.0 * wx) + 0.17 * np.cos(2.3 * wy + 1.7 * wx)
         + 0.08 * np.sin(12.3 * wx + 4.1 * wy) + 0.08 * np.cos(16.7 * wy))
    g = (0.5 + 0.17 * np.sin(1.3 * wx + 2.1 * wy) + 0.17 * np.cos(4.1 * wy)
         + 0.08 * np.sin(15.9 * wy - 6.3 * wx) + 0.08 * np.cos(17.3 * wx))
    b = (0.5 + 0.17 * np.sin(2.7 * wx * wy * 0.3) + 0.17 * np.cos(1.9 * wx)
         + 0.08 * np.sin(14.3 * wx + 7.7 * wy) + 0.08 * np.cos(13.9 * wy))
    return np.stack([r, g, b], axis=-1).astype(np.float32)


def _render_plane(intr, ext, height, width, plane_n, plane_c):
    """Render the plane n.X = c from camera (K, E). Returns (img, depth)."""
    kinv = np.linalg.inv(intr)
    rot = ext[:3, :3]
    t = ext[:3, 3]
    cam_center = -rot.T @ t  # world-frame camera center
    ys, xs = np.meshgrid(np.arange(height, dtype=np.float64),
                         np.arange(width, dtype=np.float64), indexing="ij")
    pix = np.stack([xs, ys, np.ones_like(xs)], axis=-1)  # [H,W,3]
    dirs_cam = pix @ kinv.T  # [H,W,3] camera-frame ray dirs (z=1)
    dirs_world = dirs_cam @ rot  # R^T @ d
    denom = dirs_world @ plane_n
    tt = (plane_c - cam_center @ plane_n) / denom  # [H,W]
    pts = cam_center[None, None, :] + tt[..., None] * dirs_world
    depth = tt * dirs_cam[..., 2]  # camera-frame z = t * dz_cam (dz_cam == 1)
    img = _texture(pts[..., 0], pts[..., 2])
    return img.astype(np.float32), depth.astype(np.float32)


def render_synthetic_views(height=128, width=160, nviews=3, seed=0):
    """Render all views of one scene. Returns a dict with imgs [N,H,W,3],
    depths [N,H,W] (per-view GT), intr (3,3 full-res), exts [N,4,4],
    plane (n, c), dmin/dmax of the ref view's depth range."""
    rs = np.random.default_rng(seed)
    f = 0.9 * width
    intr = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]],
                    dtype=np.float32)
    # plane roughly facing the rig at distance ~6 with a random tilt
    tilt = 0.15 * rs.standard_normal(2)
    plane_n = np.array([tilt[0], tilt[1], 1.0])
    plane_n /= np.linalg.norm(plane_n)
    plane_c = 6.0

    imgs, depths, exts = [], [], []
    for v in range(nviews):
        angle = 0.04 * v + 0.01 * rs.standard_normal()
        ca, sa = np.cos(angle), np.sin(angle)
        rot = np.array([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]], dtype=np.float64)
        t = np.array([0.25 * v + 0.02 * rs.standard_normal(),
                      0.05 * v, 0.0])
        ext = np.eye(4, dtype=np.float32)
        ext[:3, :3] = rot
        ext[:3, 3] = t
        img, depth = _render_plane(intr.astype(np.float64), ext.astype(np.float64),
                                   height, width, plane_n, plane_c)
        imgs.append(img)
        depths.append(depth)
        exts.append(ext)
    ref_depth = depths[0]
    return {
        "imgs": np.stack(imgs),
        "depths": np.stack(depths),
        "intr": intr,
        "exts": np.stack(exts),
        "plane": (plane_n, plane_c),
        "dmin": float(ref_depth.min()) * 0.9,
        "dmax": float(ref_depth.max()) * 1.1,
    }


def make_synthetic_sample(height=128, width=160, nviews=3, ndepths=48,
                          seed=0, with_gt=True, ref_view=None):
    """One training sample. ref_view rotates which camera is the reference
    (default: seed-derived) — like DTU's 49 ref views per scan, every rig
    pose serves as reference, so the model never overfits to a canonical
    reference pose."""
    scene = render_synthetic_views(height, width, nviews, seed)
    if ref_view is None:
        ref_view = seed % nviews
    order = [ref_view] + [v for v in range(nviews) if v != ref_view]
    imgs = scene["imgs"][order]
    depth_full = scene["depths"][ref_view]
    projs = []
    for v in order:
        proj = np.zeros((2, 4, 4), np.float32)
        proj[0] = scene["exts"][v]
        # stage-1 convention: cam files carry quarter-res K
        k1 = scene["intr"].copy()
        k1[:2] /= 4.0
        proj[1, :3, :3] = k1
        projs.append(proj)
    projs = np.stack(projs)
    dmin = float(scene["depths"][ref_view].min()) * 0.9
    dmax = float(scene["depths"][ref_view].max()) * 1.1
    depth_values = np.linspace(dmin, dmax, ndepths, dtype=np.float32)

    sample = {
        "imgs": imgs,
        "proj_matrices": stage_proj_matrices(projs),
        "depth_values": depth_values,
        "intrinsics_matrices": stage_intrinsics(projs[0, 1, :3, :3]),
        "filename": "synthetic/{}/" + f"{seed:0>8}" + "{}",
    }
    if with_gt:
        import cv2
        h, w = depth_full.shape
        pyr = {
            "stage1": cv2.resize(depth_full, (w // 4, h // 4),
                                 interpolation=cv2.INTER_NEAREST),
            "stage2": cv2.resize(depth_full, (w // 2, h // 2),
                                 interpolation=cv2.INTER_NEAREST),
            "stage3": depth_full,
        }
        sample["depth"] = pyr
        sample["mask"] = {k: np.ones_like(v) for k, v in pyr.items()}
    return sample


def export_synthetic_scene(datapath, scan="scan_synth", height=128, width=160,
                           nviews=5, seed=10_000, num_depth=192):
    """Write one synthetic scene to disk in the MVSNet eval layout that
    general_eval/dypcd consume (images/{v:08d}.jpg, cams/{v:08d}_cam.txt
    with FULL-res K + 4-field depth line, pair.txt), plus ground truth:
    gt_depths/{v:08d}.pfm and a world-frame GT point cloud
    (gt_points.npy, every view's GT depth backprojected).

    The GT cloud is the synthetic stand-in for the DTU STL reference used
    by eval/dtu_eval.evaluate_scan (BaseEvalMain_web.m:44-46 loads the
    scan STL); real DTU data is not on this host.
    """
    import cv2

    from ..core.cameras import write_cam_file
    from ..core.pfm import write_pfm

    scene = render_synthetic_views(height, width, nviews, seed)
    base = os.path.join(datapath, scan)
    for sub in ("images", "cams", "gt_depths"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)

    gt_points = []
    for v in range(nviews):
        img = (np.clip(scene["imgs"][v], 0, 1) * 255).astype(np.uint8)
        # near-lossless JPEG (q100 + 4:4:4): q98's 4:2:0 DCT noise is
        # ~0.35 px of photometric matching ambiguity on this texture —
        # several mm of depth noise on this rig — which would measure the
        # codec, not the framework (train images are rendered in memory
        # and never pass through a codec)
        cv2.imwrite(os.path.join(base, f"images/{v:08d}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 100,
                     cv2.IMWRITE_JPEG_SAMPLING_FACTOR,
                     cv2.IMWRITE_JPEG_SAMPLING_FACTOR_444])
        # PER-VIEW depth range (like DTU's per-view cam.txt ranges): the
        # rig's far cameras see the plane over a wider depth span than
        # view 0 — a shared view-0 range clips their sweep and caps the
        # achievable accuracy monotonically in view index (the r2 bug:
        # ACCURACY_r02 per-view error 2.5 -> 24.4 mm)
        dmin = float(scene["depths"][v].min()) * 0.9
        dmax = float(scene["depths"][v].max()) * 1.1
        interval = (dmax - dmin) / num_depth
        write_cam_file(os.path.join(base, f"cams/{v:08d}_cam.txt"),
                       scene["intr"], scene["exts"][v], dmin, interval,
                       num_depth=num_depth, depth_max=dmax)
        write_pfm(os.path.join(base, f"gt_depths/{v:08d}.pfm"),
                  scene["depths"][v])
        # backproject GT depth to world-frame points
        h, w = scene["depths"][v].shape
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        pix = np.stack([xs, ys, np.ones_like(xs)], -1).reshape(-1, 3)
        kinv = np.linalg.inv(scene["intr"].astype(np.float64))
        cam = (pix @ kinv.T) * scene["depths"][v].reshape(-1, 1)
        ext = scene["exts"][v].astype(np.float64)
        world = (cam - ext[:3, 3]) @ ext[:3, :3]  # R^T (x - t)
        gt_points.append(world)
    gt_points = np.concatenate(gt_points, 0).astype(np.float32)
    np.save(os.path.join(base, "gt_points.npy"), gt_points)

    from ..core.pairs import write_pair_file
    pairs = [(v, [s for s in range(nviews) if s != v]) for v in range(nviews)]
    write_pair_file(os.path.join(base, "pair.txt"), pairs)
    return base


class SyntheticDataset:
    def __init__(self, datapath=None, listfile=None, mode="train", nviews=3,
                 ndepths=48, interval_scale=1.0, height=128, width=160,
                 length=16, **kwargs):
        self.nviews = nviews
        self.ndepths = ndepths
        self.height = height
        self.width = width
        self.length = length
        self.mode = mode

    def __len__(self):
        return self.length

    def __getitem__(self, idx):
        return make_synthetic_sample(self.height, self.width, self.nviews,
                                     self.ndepths, seed=idx,
                                     with_gt=self.mode != "test")
