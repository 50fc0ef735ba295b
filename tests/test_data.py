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
