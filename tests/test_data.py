"""Data pipeline tests: synthetic dataset, collation, loader, and the DTU /
general_eval loaders against a fake on-disk scene."""
import os

import numpy as np
import pytest

from damvsnet_tpu.data import find_dataset_def, collate, DataLoader
from damvsnet_tpu.data.synthetic import SyntheticDataset, make_synthetic_sample
from damvsnet_tpu.core.cameras import write_cam_file
from damvsnet_tpu.core.pairs import write_pair_file
from damvsnet_tpu.core.pfm import write_pfm


def test_registry():
    assert find_dataset_def("dtu_yao").__name__ == "DTUTrainDataset"
    assert find_dataset_def("general_eval").__name__ == "GeneralEvalDataset"
    assert find_dataset_def("blendedmvs").__name__ == "BlendedMVSDataset"
    assert find_dataset_def("tnt_eval_trans").__name__ == "TnTEvalDataset"


def test_synthetic_sample_shapes():
    s = make_synthetic_sample(height=64, width=80, nviews=4, ndepths=32)
    assert s["imgs"].shape == (4, 64, 80, 3)
    assert s["depth_values"].shape == (32,)
    assert s["proj_matrices"]["stage1"].shape == (4, 2, 4, 4)
    assert s["depth"]["stage1"].shape == (16, 20)
    assert s["depth"]["stage3"].shape == (64, 80)
    # stage K scaling x1/x2/x4
    k1 = s["proj_matrices"]["stage1"][0, 1, :2]
    k3 = s["proj_matrices"]["stage3"][0, 1, :2]
    np.testing.assert_allclose(k3, k1 * 4)
    # GT depth within the sweep range
    assert s["depth"]["stage3"].min() >= s["depth_values"][0]
    assert s["depth"]["stage3"].max() <= s["depth_values"][-1]


def test_synthetic_views_consistent():
    """The rendered views must be photo-consistent: warping src into ref via
    GT depth reproduces the ref image (validates the generator itself)."""
    import jax.numpy as jnp
    from damvsnet_tpu.losses.crossview import inverse_warping
    s = make_synthetic_sample(height=64, width=80, nviews=2, ndepths=8)
    ref_cam = s["proj_matrices"]["stage3"][0][None]
    src_cam = s["proj_matrices"]["stage3"][1][None]
    warped, mask = inverse_warping(
        jnp.asarray(s["imgs"][1][None]), jnp.asarray(ref_cam),
        jnp.asarray(src_cam), jnp.asarray(s["depth"]["stage3"][None]))
    m = np.asarray(mask)[0, :, :, 0] > 0
    err = np.abs(np.asarray(warped)[0][m] - s["imgs"][0][m])
    assert m.mean() > 0.5
    assert err.mean() < 0.02, err.mean()


def test_collate_and_loader():
    ds = SyntheticDataset(height=32, width=40, length=5, ndepths=8)
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    b = batches[0]
    assert b["imgs"].shape == (2, 3, 32, 40, 3)
    assert b["proj_matrices"]["stage2"].shape == (2, 3, 2, 4, 4)
    assert b["depth"]["stage3"].shape == (2, 32, 40)


@pytest.fixture
def fake_dtu(tmp_path):
    """Minimal DTU-format training tree: 1 scan, 3 views, 1 light."""
    import cv2
    from PIL import Image
    root = tmp_path
    scan = "scan1"
    n_views = 3
    (root / "Cameras" / "train").mkdir(parents=True)
    (root / f"Rectified/{scan}_train").mkdir(parents=True)
    (root / f"Depths_raw/{scan}").mkdir(parents=True)
    pairs = [(v, [(v + 1) % n_views, (v + 2) % n_views]) for v in range(n_views)]
    write_pair_file(root / "Cameras" / "pair.txt", pairs)
    rs = np.random.default_rng(0)
    for v in range(n_views):
        intr = np.array([[100.0, 0, 80], [0, 100.0, 64], [0, 0, 1]], np.float32)
        ext = np.eye(4, dtype=np.float32)
        ext[0, 3] = v * 0.1
        write_cam_file(root / "Cameras" / "train" / f"{v:0>8}_cam.txt",
                       intr, ext, 425.0, 2.5)
        for light in range(7):
            img = (rs.random((512, 640, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(
                root / f"Rectified/{scan}_train/rect_{v + 1:0>3}_{light}_r5000.png")
        depth_hr = (500 + 100 * rs.random((1200, 1600))).astype(np.float32)
        write_pfm(root / f"Depths_raw/{scan}/depth_map_{v:0>4}.pfm", depth_hr)
        mask = (rs.random((1200, 1600)) * 255).astype(np.uint8)
        Image.fromarray(mask).save(
            root / f"Depths_raw/{scan}/depth_visual_{v:0>4}.png")
    listfile = root / "train.txt"
    listfile.write_text(f"{scan}\n")
    return root, listfile


def test_dtu_loader(fake_dtu):
    root, listfile = fake_dtu
    ds = find_dataset_def("dtu_yao")(str(root), str(listfile), "train", 3,
                                     ndepths=192, interval_scale=1.06)
    assert len(ds) == 3 * 7
    s = ds[0]
    assert s["imgs"].shape == (3, 512, 640, 3)
    assert s["depth"]["stage1"].shape == (128, 160)
    assert s["depth"]["stage3"].shape == (512, 640)
    assert s["mask"]["stage2"].shape == (256, 320)
    assert s["depth_values"].shape == (192,)
    np.testing.assert_allclose(s["depth_values"][0], 425.0)
    np.testing.assert_allclose(
        s["depth_values"][1] - s["depth_values"][0], 2.5 * 1.06, rtol=1e-5)
    np.testing.assert_allclose(
        s["proj_matrices"]["stage3"][0, 1, :2],
        s["proj_matrices"]["stage1"][0, 1, :2] * 4)


@pytest.fixture
def fake_eval_scene(tmp_path):
    """general_eval-format scene: images/ + cams/ + pair.txt."""
    from PIL import Image
    scan = "scan1"
    root = tmp_path
    (root / scan / "images").mkdir(parents=True)
    (root / scan / "cams").mkdir(parents=True)
    rs = np.random.default_rng(0)
    n_views = 3
    for v in range(n_views):
        img = (rs.random((1200, 1600, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / scan / "images" / f"{v:0>8}.jpg")
        intr = np.array([[1000.0, 0, 800], [0, 1000.0, 600], [0, 0, 1]],
                        np.float32)
        ext = np.eye(4, dtype=np.float32)
        ext[0, 3] = 0.1 * v
        write_cam_file(root / scan / "cams" / f"{v:0>8}_cam.txt", intr, ext,
                       425.0, 2.5)
    write_pair_file(root / scan / "pair.txt",
                    [(v, [(v + 1) % n_views, (v + 2) % n_views])
                     for v in range(n_views)])
    return root, scan


def test_general_eval_loader(fake_eval_scene):
    root, scan = fake_eval_scene
    ds = find_dataset_def("general_eval")(
        str(root), [scan], "test", 3, ndepths=192, interval_scale=1.06,
        max_h=864, max_w=1152)
    s = ds[0]
    n, h, w, c = s["imgs"].shape
    assert h % 32 == 0 and w % 32 == 0
    assert h <= 864 and w <= 1152
    # intrinsics quarter-res at stage1 and scaled consistently with resize
    k1 = s["proj_matrices"]["stage1"][0, 1]
    assert k1[0, 0] < 1000.0 / 4 + 1
    assert "filename" in s and s["filename"].startswith(scan)


@pytest.fixture
def fake_tnt_scene(tmp_path):
    """TnT-format scene with the native 1920x1080 'Family' geometry and a
    4-field depth line (reference tnt_eval_trans.py:72-77)."""
    from PIL import Image
    scan = "Family"
    root = tmp_path
    (root / scan / "images").mkdir(parents=True)
    (root / scan / "cams").mkdir(parents=True)
    rs = np.random.default_rng(0)
    n_views = 3
    for v in range(n_views):
        img = (rs.random((1080, 1920, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / scan / "images" / f"{v:0>8}.jpg")
        ext = np.eye(4, dtype=np.float32)
        ext[0, 3] = 0.1 * v
        lines = ["extrinsic"]
        lines += [" ".join(str(x) for x in row) for row in ext]
        lines += ["", "intrinsic"]
        intr = [[1165.0, 0.0, 960.0], [0.0, 1165.0, 540.0], [0.0, 0.0, 1.0]]
        lines += [" ".join(str(x) for x in row) for row in intr]
        # 4-field depth line: min interval num_depth max
        lines += ["", "0.5 0.005 900 5.0"]
        (root / scan / "cams" / f"{v:0>8}_cam.txt").write_text(
            "\n".join(lines) + "\n")
    write_pair_file(root / scan / "pair.txt",
                    [(v, [(v + 1) % n_views]) for v in range(n_views)])
    return root, scan


def test_tnt_eval_loader(fake_tnt_scene):
    """Per-scene native sizing: 1920x1080 snaps to 1920x1056 (x32) with the
    K rows rescaled by the snap (reference tnt_eval_trans.py:26-39,137-152),
    stage-1 K pre-divided by 4, and the 4-field depth line re-deriving the
    interval as (max-min)/ndepths."""
    root, scan = fake_tnt_scene
    ds = find_dataset_def("tnt_eval_trans")(
        str(root), [scan], "test", 3, ndepths=192, interval_scale=1.0)
    assert len(ds) == 3  # short src lists are padded, not dropped
    s = ds[0]
    n, h, w, _ = s["imgs"].shape
    assert (h, w) == (1056, 1920)  # native 'Family' size snapped to x32
    # stage-3 K: full-res K /4 (read) * 4 (stage scaling) * snap factors
    k3 = s["proj_matrices"]["stage3"][0, 1]
    np.testing.assert_allclose(k3[0, 0], 1165.0, rtol=1e-5)  # w unchanged
    np.testing.assert_allclose(k3[1, 1], 1165.0 * 1056 / 1080, rtol=1e-5)
    np.testing.assert_allclose(k3[1, 2], 540.0 * 1056 / 1080, rtol=1e-5)
    k1 = s["proj_matrices"]["stage1"][0, 1]
    np.testing.assert_allclose(k3[:2] / 4, k1[:2], rtol=1e-6)
    # 4-field depth handling: interval = (0.5 + 900*0.005 - 0.5)/192
    dv = s["depth_values"]
    assert dv.shape == (192,)
    np.testing.assert_allclose(dv[0], 0.5)
    np.testing.assert_allclose(dv[1] - dv[0], 4.5 / 192, rtol=1e-5)
    assert s["filename"] == scan + "/{}/00000000{}"


@pytest.fixture
def fake_blendedmvs(tmp_path):
    """BlendedMVS-format tree: blended_images + cams(+pair) + rendered
    depth maps at the native 768x576 low-res size."""
    from PIL import Image
    root = tmp_path
    scene = "5a0271884e62597cdee0d0eb"
    (root / scene / "blended_images").mkdir(parents=True)
    (root / scene / "cams").mkdir(parents=True)
    (root / scene / "rendered_depth_maps").mkdir(parents=True)
    rs = np.random.default_rng(0)
    n_views = 4
    for v in range(n_views):
        img = (rs.random((576, 768, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(
            root / scene / "blended_images" / f"{v:08d}.jpg")
        ext = np.eye(4, dtype=np.float32)
        ext[0, 3] = 0.1 * v
        intr = np.array([[578.0, 0, 384.0], [0, 578.0, 288.0], [0, 0, 1]],
                        np.float32)
        write_cam_file(root / scene / "cams" / f"{v:08d}_cam.txt",
                       intr, ext, 2.0, 0.02)
        depth = (2.5 + rs.random((576, 768))).astype(np.float32)
        depth[:8] = 0.0  # invalid band -> mask zeros (depth < depth_min)
        write_pfm(root / scene / "rendered_depth_maps" / f"{v:08d}.pfm",
                  depth)
    # cluster file: ref 0 has 3 sources, ref 1 only 1 (skipped for nviews=3)
    pair = [f"{n_views}"]
    srcs = {0: [1, 2, 3], 1: [0], 2: [3, 0], 3: [2, 1]}
    for v in range(n_views):
        pair.append(str(v))
        pair.append(" ".join([str(len(srcs[v]))] + [
            f"{s} {100.0 - i}" for i, s in enumerate(srcs[v])]))
    (root / scene / "cams" / "pair.txt").write_text("\n".join(pair) + "\n")
    listfile = root / "train.txt"
    listfile.write_text(scene + "\n")
    return root, listfile


def test_blendedmvs_loader(fake_blendedmvs):
    """Finetune-loader semantics (reference blendedmvs.py:17-37,183-206):
    refs with < nviews-1 sources skipped, per-stage K x0.25/x0.5/x1 (native
    res features), mask = depth >= depth_min, nearest-pyramid GT, and the
    reference's intrinsics-filled-with-proj bug NOT replicated."""
    root, listfile = fake_blendedmvs
    ds = find_dataset_def("blendedmvs")(
        str(root), str(listfile), "train", 3, ndepths=128,
        interval_scale=1.06)
    assert len(ds) == 3  # ref 1 (single source) is skipped
    s = ds[0]
    assert s["imgs"].shape == (3, 576, 768, 3)
    assert np.isfinite(s["imgs"]).all() and s["imgs"].max() <= 1.0 + 1e-6
    # stage K scaling x0.25 / x0.5 / x1 of the SAME cam.txt K
    p1, p3 = s["proj_matrices"]["stage1"], s["proj_matrices"]["stage3"]
    np.testing.assert_allclose(p3[0, 1, :2] * 0.25, p1[0, 1, :2], rtol=1e-6)
    np.testing.assert_allclose(p3[0, 1, 0, 0], 578.0, rtol=1e-6)
    # extrinsics untouched by stage scaling
    np.testing.assert_allclose(p1[:, 0], p3[:, 0])
    # GT pyramid + mask: stage1 quarter res; invalid band masked out
    assert s["depth"]["stage1"].shape == (144, 192)
    assert s["depth"]["stage3"].shape == (576, 768)
    assert s["mask"]["stage3"][:8].max() == 0.0
    assert s["mask"]["stage3"][16:].min() == 1.0
    dv = s["depth_values"]
    assert dv.shape == (128,)
    np.testing.assert_allclose(dv[0], 2.0)
    np.testing.assert_allclose(dv[1] - dv[0], 0.02 * 1.06, rtol=1e-5)
    # intrinsics_matrices carries real per-stage K (3x3), not proj (the
    # reference's blendedmvs.py:202-206 bug is deliberately not kept)
    assert s["intrinsics_matrices"]["stage3"].shape == (3, 3)
    np.testing.assert_allclose(s["intrinsics_matrices"]["stage3"][0, 0],
                               578.0, rtol=1e-6)
