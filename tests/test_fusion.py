"""Fusion tests on a synthetic scene with analytic GT depth: write the
reference output layout (pfm depth/conf, cam.txt, jpg, pair.txt) to a tmp
dir, fuse, and verify the cloud lies on the known world plane."""
import os

import numpy as np
import pytest

from damvsnet_tpu.core.cameras import write_cam_file
from damvsnet_tpu.core.pairs import write_pair_file
from damvsnet_tpu.core.pfm import write_pfm
from damvsnet_tpu.core.ply import read_ply
from damvsnet_tpu.data.synthetic import _render_plane


@pytest.fixture(scope="module")
def synthetic_scene(tmp_path_factory):
    """3-view scene of the plane z=6 (world frame), perfect depths."""
    root = tmp_path_factory.mktemp("scene")
    scan = "scan1"
    h, w = 64, 80
    f = 0.9 * w
    intr = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    plane_n = np.array([0.0, 0.0, 1.0])
    plane_c = 6.0

    data_dir = root / "data" / scan
    out_dir = root / "out" / scan
    for sub in ("cams", "images", "depth_est", "confidence"):
        os.makedirs(out_dir / sub, exist_ok=True)
    os.makedirs(data_dir, exist_ok=True)

    views = []
    for v in range(3):
        a = 0.06 * v
        ca, sa = np.cos(a), np.sin(a)
        ext = np.eye(4, dtype=np.float32)
        ext[:3, :3] = np.array([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]], np.float32)
        ext[:3, 3] = [0.3 * v, 0.05 * v, 0.0]
        img, depth = _render_plane(intr.astype(np.float64),
                                   ext.astype(np.float64), h, w,
                                   plane_n, plane_c)
        views.append((intr, ext, img, depth))
        write_cam_file(out_dir / "cams" / f"{v:0>8}_cam.txt", intr, ext, 4.0, 0.05)
        write_pfm(out_dir / "depth_est" / f"{v:0>8}.pfm", depth)
        for suffix in (".pfm", "_stage2.pfm", "_stage1.pfm"):
            write_pfm(out_dir / "confidence" / f"{v:0>8}{suffix}",
                      np.full((h, w), 0.99, np.float32))
        from PIL import Image
        Image.fromarray((img * 255).astype(np.uint8)).save(
            out_dir / "images" / f"{v:0>8}.jpg")

    pairs = [(0, [1, 2]), (1, [0, 2]), (2, [0, 1])]
    write_pair_file(data_dir / "pair.txt", pairs)
    write_pair_file(out_dir / "pair.txt", pairs)
    return {"root": root, "scan": scan, "plane_c": plane_c, "h": h, "w": w,
            "data": root / "data", "out": root / "out"}


def _check_cloud(ply_path, plane_c, min_points=500):
    xyz, rgb = read_ply(ply_path)
    assert len(xyz) >= min_points
    # fused points must lie on the world plane z = plane_c
    resid = np.abs(xyz[:, 2] - plane_c)
    assert np.median(resid) < 0.02, np.median(resid)
    assert rgb is not None and rgb.shape == xyz.shape


def test_dypcd_fusion(synthetic_scene):
    from damvsnet_tpu.infer.fusion_dypcd import dypcd_filter
    s = synthetic_scene
    dypcd_filter(str(s["data"]), str(s["out"]), [s["scan"]],
                 conf=(0.1, 0.15, 0.9), log_fn=lambda *a: None)
    _check_cloud(s["out"] / f"{s['scan']}.ply", s["plane_c"])


def test_pcd_fusion(synthetic_scene):
    from damvsnet_tpu.infer.fusion_pcd import pcd_filter
    s = synthetic_scene
    pcd_filter(str(s["data"]), str(s["out"]), [s["scan"]],
               thres_view=2, dtu_naming=False, log_fn=lambda *a: None)
    _check_cloud(s["out"] / f"{s['scan']}.ply", s["plane_c"])


def test_consistency_fusion_matches_dypcd(synthetic_scene):
    """The TPU-batched fusion must reproduce the numpy dypcd cloud."""
    from damvsnet_tpu.infer.fusion_tpu import consistency_filter
    from damvsnet_tpu.infer.fusion_dypcd import dypcd_filter
    s = synthetic_scene
    dypcd_filter(str(s["data"]), str(s["out"]), [s["scan"]],
                 log_fn=lambda *a: None)
    ref_xyz, _ = read_ply(s["out"] / f"{s['scan']}.ply")
    consistency_filter(str(s["data"]), str(s["out"]), [s["scan"]],
                       log_fn=lambda *a: None)
    tpu_xyz, _ = read_ply(s["out"] / f"{s['scan']}.ply")
    # same acceptance decisions => same point count; values match to fp tol
    assert abs(len(tpu_xyz) - len(ref_xyz)) <= 0.01 * len(ref_xyz)
    n = min(len(tpu_xyz), len(ref_xyz))
    if len(tpu_xyz) == len(ref_xyz):
        np.testing.assert_allclose(tpu_xyz, ref_xyz, atol=1e-3)


def test_gipuma_bridge_formats(synthetic_scene, tmp_path):
    from damvsnet_tpu.infer.gipuma_bridge import (
        probability_filter, mvsnet_to_gipuma, write_gipuma_dmb, read_gipuma_dmb)
    s = synthetic_scene
    scan_folder = str(s["out"] / s["scan"])
    probability_filter(scan_folder, scan_folder, 0.5)
    assert os.path.exists(os.path.join(
        scan_folder, "depth_est/00000000_prob_filtered.pfm"))
    groot = tmp_path / "gipuma"
    mvsnet_to_gipuma(scan_folder, scan_folder, str(groot))
    assert (groot / "cams" / "00000000.jpg.P").exists()
    assert (groot / "2333_00000000" / "disp.dmb").exists()
    # dmb roundtrip
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    write_gipuma_dmb(tmp_path / "x.dmb", arr)
    np.testing.assert_array_equal(read_gipuma_dmb(tmp_path / "x.dmb"), arr)
