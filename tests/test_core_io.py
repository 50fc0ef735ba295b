import numpy as np

from damvsnet_tpu.core import (
    read_cam_file, write_cam_file, read_pfm, write_pfm,
    read_ply, write_ply, read_pair_file, write_pair_file,
    stage_intrinsics, stage_proj_matrices, fuse_proj,
)


def test_pfm_roundtrip(tmp_path, rng):
    img = rng.standard_normal((17, 23)).astype(np.float32)
    p = tmp_path / "d.pfm"
    write_pfm(p, img)
    back, scale = read_pfm(p)
    np.testing.assert_array_equal(back, img)
    assert scale == 1.0


def test_pfm_color_roundtrip(tmp_path, rng):
    img = rng.standard_normal((5, 7, 3)).astype(np.float32)
    p = tmp_path / "c.pfm"
    write_pfm(p, img)
    back, _ = read_pfm(p)
    np.testing.assert_array_equal(back, img)


def test_pfm_matches_reference_reader(tmp_path, rng):
    """Our PFM bytes parse identically under the reference's reader."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_data_io", "/root/reference/datasets/data_io.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    img = rng.standard_normal((11, 13)).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    write_pfm(p, img)
    back, _ = ref.read_pfm(p)
    np.testing.assert_array_equal(back, img)
    ref.save_pfm(str(tmp_path / "y.pfm"), img)
    ours, _ = read_pfm(str(tmp_path / "y.pfm"))
    np.testing.assert_array_equal(ours, img)


def test_cam_file_roundtrip(tmp_path):
    ext = np.linalg.qr(np.arange(16).reshape(4, 4) + np.eye(4))[0].astype(np.float32)
    intr = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], np.float32)
    p = tmp_path / "cam.txt"
    write_cam_file(p, intr, ext, 425.0, 2.5)
    k, e, dmin, dint = read_cam_file(p)
    np.testing.assert_allclose(k, intr, atol=1e-4)
    np.testing.assert_allclose(e, ext, atol=1e-4)
    assert dmin == 425.0 and dint == 2.5


def test_cam_file_interval_rescale(tmp_path):
    """4-field depth line recomputes interval for our ndepths (general_eval.py:72-77)."""
    intr = np.eye(3, dtype=np.float32)
    ext = np.eye(4, dtype=np.float32)
    p = tmp_path / "cam.txt"
    write_cam_file(p, intr, ext, 100.0, 1.0, num_depth=256)
    _, _, dmin, dint = read_cam_file(p, interval_scale=1.06, ndepths=128)
    assert dmin == 100.0
    np.testing.assert_allclose(dint, (256.0 / 128.0) * 1.06, rtol=1e-6)


def test_ply_roundtrip(tmp_path, rng):
    xyz = rng.standard_normal((100, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (100, 3)).astype(np.uint8)
    p = tmp_path / "c.ply"
    write_ply(p, xyz, rgb)
    x2, c2 = read_ply(p)
    np.testing.assert_array_equal(x2, xyz)
    np.testing.assert_array_equal(c2, rgb)


def test_pair_roundtrip(tmp_path):
    pairs = [(0, [1, 2, 3]), (1, [0, 2]), (5, [4])]
    p = tmp_path / "pair.txt"
    write_pair_file(p, pairs)
    assert read_pair_file(p) == pairs


def test_stage_scaling():
    k = np.array([[10.0, 0, 5], [0, 12.0, 6], [0, 0, 1]], np.float32)
    ks = stage_intrinsics(k)
    np.testing.assert_allclose(ks["stage1"], k)
    np.testing.assert_allclose(ks["stage2"][:2], k[:2] * 2)
    np.testing.assert_allclose(ks["stage3"][:2], k[:2] * 4)
    np.testing.assert_allclose(ks["stage3"][2], k[2])


def test_fuse_proj():
    ext = np.eye(4, dtype=np.float32)
    ext[:3, 3] = [1, 2, 3]
    k = np.array([[2.0, 0, 1], [0, 3.0, 2], [0, 0, 1]], np.float32)
    proj = np.zeros((2, 4, 4), np.float32)
    proj[0] = ext
    proj[1, :3, :3] = k
    fused = fuse_proj(proj)
    np.testing.assert_allclose(fused[:3, :4], k @ ext[:3, :4])
    np.testing.assert_allclose(fused[3], ext[3])
