"""Native C++ kernels vs their Python reference implementations."""
import numpy as np
import pytest

from damvsnet_tpu.native_ext import (
    get_lib, dypcd_consistency_native, grid_nn_distances, reduce_points_native)


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def _scene_pair(rng, h=48, w=64):
    from damvsnet_tpu.data.synthetic import _render_plane
    f = 0.9 * w
    intr = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    exts, depths = [], []
    for v in range(2):
        a = 0.05 * v
        ca, sa = np.cos(a), np.sin(a)
        ext = np.eye(4, dtype=np.float32)
        ext[:3, :3] = np.array([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]], np.float32)
        ext[:3, 3] = [0.3 * v, 0.02 * v, 0]
        _, depth = _render_plane(intr.astype(np.float64), ext.astype(np.float64),
                                 h, w, np.array([0.05, -0.03, 1.0]) / np.linalg.norm([0.05, -0.03, 1.0]), 6.0)
        exts.append(ext)
        # noise amplitude chosen so rel_diff sits well below the tightest
        # dynamic threshold for most pixels and well above it for a few —
        # borderline-at-threshold pixels would make bitwise agreement
        # between fp32-numpy and fp64-C++ meaningless
        noise = 0.001 * rng.standard_normal((h, w)).astype(np.float32)
        noise[::7, ::5] += 0.5  # clear outliers
        depths.append(depth + noise)
    return intr, exts, depths


def test_dypcd_consistency_matches_numpy(lib, rng):
    from damvsnet_tpu.infer.fusion_dypcd import check_geometric_consistency
    intr, exts, depths = _scene_pair(rng)
    ref_masks, ref_final, ref_reproj, _, _ = check_geometric_consistency(
        depths[0], intr, exts[0], depths[1], intr, exts[1])
    nat = dypcd_consistency_native(depths[0], intr, exts[0], depths[1],
                                   intr, exts[1])
    nat_masks, nat_final, nat_reproj = nat
    for t in range(9):
        agree = (np.asarray(nat_masks[t]) == ref_masks[t]).mean()
        assert agree > 0.99, (t, agree)
    valid = ref_final & nat_final
    np.testing.assert_allclose(nat_reproj[valid], ref_reproj[valid],
                               rtol=1e-3, atol=1e-3)


def test_grid_nn_matches_kdtree(lib, rng):
    a = (rng.random((500, 3)) * 50).astype(np.float32)
    b = (rng.random((300, 3)) * 50).astype(np.float32)
    from damvsnet_tpu.eval.dtu_eval import nn_distances
    ref = nn_distances(a, b, max_dist=60.0)
    nat = grid_nn_distances(a, b, max_dist=60.0)
    np.testing.assert_allclose(nat, ref, rtol=1e-4, atol=1e-4)


def test_grid_nn_cap(lib):
    a = np.zeros((1, 3), np.float32)
    b = np.array([[500.0, 0, 0]], np.float32)
    assert grid_nn_distances(a, b, max_dist=60.0)[0] == 60.0


def test_reduce_points_native_property(lib, rng):
    pts = (rng.random((3000, 3)) * 10).astype(np.float32)
    out = reduce_points_native(pts, dst=0.5)
    assert 0 < len(out) < len(pts)
    from scipy.spatial import cKDTree
    d, _ = cKDTree(out).query(out, k=2)
    assert d[:, 1].min() >= 0.5 - 1e-5


def test_reduce_points_native_matches_python_count(lib, rng):
    """Same RNG order => identical kept set as the Python implementation."""
    from damvsnet_tpu.eval.dtu_eval import reduce_points
    pts = (rng.random((2000, 3)) * 5).astype(np.float32)
    py = reduce_points(pts, dst=0.3, seed=7)
    nat = reduce_points_native(pts, dst=0.3, seed=7)
    assert len(py) == len(nat)
    np.testing.assert_allclose(np.sort(py.ravel()), np.sort(nat.ravel()),
                               rtol=1e-6)
