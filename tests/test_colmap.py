"""colmap2mvsnet converter tests on a tiny synthetic COLMAP text model."""
import os

import numpy as np
import pytest

from damvsnet_tpu.cli.colmap2mvsnet import (
    convert_scene, read_model, qvec2rotmat)
from damvsnet_tpu.core.cameras import read_cam_file
from damvsnet_tpu.core.pairs import read_pair_file


@pytest.fixture
def colmap_scene(tmp_path):
    """3 cameras looking at a small point cloud, text-format sparse model."""
    rs = np.random.default_rng(0)
    dense = tmp_path / "dense"
    (dense / "sparse").mkdir(parents=True)
    (dense / "images").mkdir()

    # 30 3D points in front of the cameras (z in [4, 8])
    pts = np.stack([rs.uniform(-1, 1, 30), rs.uniform(-1, 1, 30),
                    rs.uniform(4, 8, 30)], axis=1)

    with open(dense / "sparse" / "cameras.txt", "w") as f:
        f.write("# cameras\n")
        f.write("1 PINHOLE 64 48 60.0 60.0 32.0 24.0\n")

    # images.txt: IMAGE_ID QW QX QY QZ TX TY TZ CAMERA_ID NAME + points2D
    with open(dense / "sparse" / "images.txt", "w") as f:
        f.write("# images\n")
        for i in range(3):
            tx = 0.3 * i
            f.write(f"{i + 1} 1 0 0 0 {tx} 0 0 1 img{i}.jpg\n")
            # every image observes all points
            obs = " ".join(f"{10.0 + j} {12.0 + j} {j + 1}" for j in range(30))
            f.write(obs + "\n")

    with open(dense / "sparse" / "points3D.txt", "w") as f:
        f.write("# points\n")
        for j, p in enumerate(pts):
            track = " ".join(f"{i + 1} {j}" for i in range(3))
            f.write(f"{j + 1} {p[0]} {p[1]} {p[2]} 128 128 128 0.5 {track}\n")

    from PIL import Image
    for i in range(3):
        Image.fromarray((rs.random((48, 64, 3)) * 255).astype(np.uint8)).save(
            dense / "images" / f"img{i}.jpg")
    return dense, pts


def test_read_model_txt(colmap_scene):
    dense, pts = colmap_scene
    cameras, images, points3d = read_model(str(dense / "sparse"), ".txt")
    assert len(cameras) == 1 and len(images) == 3 and len(points3d) == 30
    assert cameras[1].model == "PINHOLE"
    np.testing.assert_allclose(points3d[1].xyz, pts[0])


def test_qvec_identity():
    np.testing.assert_allclose(qvec2rotmat([1, 0, 0, 0]), np.eye(3))


def test_convert_scene(colmap_scene, tmp_path):
    dense, pts = colmap_scene
    save = tmp_path / "mvs"
    n = convert_scene(str(dense), str(save), max_d=192, model_ext=".txt",
                      log_fn=lambda *a: None)
    assert n == 3
    # cams parse back with plausible depth range covering the points
    k, e, dmin, dint = read_cam_file(save / "cams" / "00000000_cam.txt")
    np.testing.assert_allclose(k[0, 0], 60.0)
    assert 3.0 < dmin < 6.0
    assert dint > 0
    # pair file ranks the other two views for each ref
    pairs = read_pair_file(save / "pair.txt")
    assert len(pairs) == 3
    assert set(pairs[0][1]) <= {0, 1, 2}
    # images copied
    assert os.path.exists(save / "images_post" / "00000001.jpg")


def test_convert_scene_inverse_depth_num(colmap_scene, tmp_path):
    dense, _ = colmap_scene
    save = tmp_path / "mvs2"
    convert_scene(str(dense), str(save), max_d=0, model_ext=".txt",
                  log_fn=lambda *a: None)
    with open(save / "cams" / "00000000_cam.txt") as f:
        fields = f.read().splitlines()[11].split()
    assert float(fields[2]) > 1  # derived hypothesis count
