"""DTU evaluation protocol tests (synthetic clouds, no DTU data needed)."""
import numpy as np

from damvsnet_tpu.eval.dtu_eval import reduce_points, nn_distances, evaluate_scan


def test_reduce_points_min_distance(rng):
    pts = rng.random((2000, 3)).astype(np.float32) * 10
    out = reduce_points(pts, dst=0.5)
    assert len(out) < len(pts)
    from scipy.spatial import cKDTree
    d, _ = cKDTree(out).query(out, k=2)
    assert d[:, 1].min() >= 0.5 - 1e-6  # no two kept points closer than dst


def test_nn_distances_matches_bruteforce(rng):
    a = rng.random((100, 3)) * 5
    b = rng.random((80, 3)) * 5
    d = nn_distances(a, b)
    brute = np.sqrt(((b[:, None] - a[None]) ** 2).sum(-1)).min(1)
    np.testing.assert_allclose(d, brute, rtol=1e-6)


def test_nn_distances_cap():
    a = np.zeros((1, 3))
    b = np.array([[100.0, 0, 0]])
    assert nn_distances(a, b, max_dist=60.0)[0] == 60.0


def test_evaluate_scan_noise_floor(rng):
    """Prediction = GT + gaussian noise => acc/comp approx E|N(0,s)| distance."""
    gt = (rng.random((5000, 3)) * 100).astype(np.float32)
    noise = rng.standard_normal((5000, 3)).astype(np.float32) * 0.3
    pred = gt + noise
    r = evaluate_scan(pred, gt, dst=0.01)  # tiny dst: keep nearly all points
    # mean NN distance should be below the mean noise magnitude (~0.46)
    assert 0.05 < r["acc"] < 0.6
    assert 0.05 < r["comp"] < 0.6
    assert abs(r["overall"] - (r["acc"] + r["comp"]) / 2) < 1e-9


def test_evaluate_scan_outlier_cutoff(rng):
    gt = (rng.random((2000, 3)) * 100).astype(np.float32)
    outliers = gt[:100] + 500.0  # far beyond the 20mm cutoff
    pred = np.concatenate([gt, outliers])
    r = evaluate_scan(pred, gt, dst=0.01)
    assert r["acc"] < 0.5  # outliers discarded, not averaged in


def test_evaluate_scan_plane_filter(rng):
    gt = (rng.random((2000, 3)) * 10).astype(np.float32)
    pred = gt.copy()
    # plane z > 5 keeps only upper half of stl for completeness
    plane = np.array([0.0, 0.0, 1.0, -5.0])
    r = evaluate_scan(pred, gt, plane=plane, dst=0.01)
    assert np.isfinite(r["comp"])
