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


def test_reduce_points_coverage(rng):
    """reducePts_haa property #2: every dropped point lies within dst of
    some kept point (the kept set is a maximal independent set)."""
    pts = rng.random((1500, 3)).astype(np.float64) * 5
    out = reduce_points(pts, dst=0.4)
    from scipy.spatial import cKDTree
    d, _ = cKDTree(out).query(pts, k=1)
    assert d.max() <= 0.4 + 1e-9


def test_evaluate_scan_hand_computed():
    """Pin the full protocol on an analytically-known configuration
    (BaseEvalMain_web.m:62-76): acc = mean over in-mask, <20 mm distances;
    comp = mean over above-plane, <20 mm distances."""
    # stl: 11x11 grid in z=0 plane, spacing 10 mm
    xs, ys = np.meshgrid(np.arange(11) * 10.0, np.arange(11) * 10.0)
    stl = np.stack([xs.ravel(), ys.ravel(), np.zeros(121)], 1)
    # pred: same grid offset by +1mm in z (dist 1 each), plus one 30mm
    # outlier (cut) and one point outside the mask volume (ignored)
    pred = np.concatenate([
        stl + np.array([0.0, 0.0, 1.0]),
        np.array([[50.0, 50.0, 30.0]]),      # 29 mm from nearest stl > 20
        np.array([[500.0, 500.0, 0.0]]),     # outside obs mask bounds
    ])
    # mask volume covering [0,110]^2 x [-5,5], res 5 -> all grid pts in
    obs = np.ones((23, 23, 3), bool)
    bb = np.array([[0.0, 0.0, -5.0], [110.0, 110.0, 5.0]])
    plane = np.array([0.0, 0.0, 1.0, 1.0])  # z > -1: all stl above
    r = evaluate_scan(pred, stl, obs_mask=obs, bb=bb, res=5.0, plane=plane,
                      dst=0.5)  # grid spacing >> dst: thinning keeps all
    np.testing.assert_allclose(r["acc"], 1.0, atol=1e-6)
    # comp: every stl point is 1mm from its pred twin
    np.testing.assert_allclose(r["comp"], 1.0, atol=1e-6)
    np.testing.assert_allclose(r["overall"], 1.0, atol=1e-6)


def test_obsmask_rounding_matches_matlab():
    """MATLAB round() is half-away-from-zero: a point exactly at a
    half-voxel boundary must round UP into the next voxel
    (PointCompareMain.m:32-34), where np.round would round-half-to-even."""
    stl = np.zeros((1, 3))
    # voxel grid res=1, BB min corner at origin; mask only voxel [1,0,0]
    obs = np.zeros((2, 1, 1), bool)
    obs[1, 0, 0] = True
    bb = np.array([[0.0, 0.0, 0.0], [2.0, 1.0, 1.0]])
    # (q-bb)/res = 0.5 -> MATLAB round = 1 (in mask); np.round would give 0
    pred = np.array([[0.5, 0.0, 0.0]])
    r = evaluate_scan(pred, stl, obs_mask=obs, bb=bb, res=1.0, dst=0.01)
    assert r["n_data"] == 1
    np.testing.assert_allclose(r["acc"], 0.5, atol=1e-9)  # point IS in mask
