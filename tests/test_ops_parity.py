"""Golden parity tests of the core ops against torch (CPU) and the
reference implementation's pure functions (imported from /root/reference —
never copied). These pin the exact resampling/warping/sampling numerics."""
import sys

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

from damvsnet_tpu.ops.resize import (  # noqa: E402
    resize_bilinear, resize_nearest, resize_trilinear_depth)
from damvsnet_tpu.ops.warp import plane_sweep_warp  # noqa: E402
from damvsnet_tpu.ops.sampling import (  # noqa: E402
    uniform_depth_samples, adaptive_depth_samples)
from damvsnet_tpu.ops.regression import (  # noqa: E402
    depth_regression, prob_volume_stats)

from conftest import make_rig  # noqa: E402


def t2j(x):
    return jnp.asarray(x.numpy())


# ---------------------------------------------------------------- resize


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("out_hw", [(16, 24), (7, 9), (32, 44), (13, 22)])
def test_resize_bilinear_matches_torch(rng, align, out_hw):
    x = rng.standard_normal((2, 13, 17, 3)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = TF.interpolate(xt, size=out_hw, mode="bilinear", align_corners=align)
    ours = resize_bilinear(jnp.asarray(x), out_hw, align_corners=align)
    np.testing.assert_allclose(
        np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)


@pytest.mark.parametrize("out_hw", [(26, 34), (6, 8)])
def test_resize_nearest_matches_torch(rng, out_hw):
    x = rng.standard_normal((1, 13, 17, 2)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = TF.interpolate(xt, size=out_hw, mode="nearest")
    ours = resize_nearest(jnp.asarray(x), out_hw)
    np.testing.assert_array_equal(np.asarray(ours), ref.permute(0, 2, 3, 1).numpy())


def test_resize_trilinear_matches_torch(rng):
    vol = rng.standard_normal((2, 8, 10, 12)).astype(np.float32)
    out = (8, 5, 6)
    vt = torch.from_numpy(vol).unsqueeze(1)
    ref = TF.interpolate(vt, size=out, mode="trilinear", align_corners=False)
    ours = resize_trilinear_depth(jnp.asarray(vol), out)
    np.testing.assert_allclose(np.asarray(ours), ref.squeeze(1).numpy(), atol=2e-6)


# ---------------------------------------------------------------- warp


def _import_reference_module():
    """Import /root/reference/models/module.py with its (torchvision-needing)
    'utils' dependency stubbed out; returns the module object."""
    import types
    if "utils" not in sys.modules or not hasattr(sys.modules.get("utils"), "local_pcd"):
        stub = types.ModuleType("utils")
        stub.local_pcd = lambda *a, **k: None
        sys.modules["utils"] = stub
    sys.path.insert(0, "/root/reference")
    try:
        import models.module as ref_module  # noqa
        return ref_module
    finally:
        sys.path.remove("/root/reference")


def _reference_homo_warping():
    return _import_reference_module().homo_warping


@pytest.mark.parametrize("per_pixel_depth", [False, True])
def test_plane_sweep_warp_matches_reference(rng, per_pixel_depth):
    homo_warping = _reference_homo_warping()
    b, v, h, w, c, d = 2, 3, 16, 20, 4, 5
    _, projs = make_rig(batch=b, num_views=v, height=h, width=w)
    src_fea = rng.standard_normal((b, c, h, w)).astype(np.float32)
    if per_pixel_depth:
        depths = (4.0 + 4.0 * rng.random((b, d, h, w))).astype(np.float32)
    else:
        depths = np.linspace(4.0, 8.0, d, dtype=np.float32)[None].repeat(b, 0)

    # fused proj matrices as the reference builds them (cas_mvsnet.py:44-47)
    def fuse(p):
        out = p[:, 0].copy()
        out[:, :3, :4] = p[:, 1, :3, :3] @ p[:, 0, :3, :4]
        return out

    ref_proj = fuse(projs[:, 0])
    src_proj = fuse(projs[:, 1])

    ref_out = homo_warping(
        torch.from_numpy(src_fea), torch.from_numpy(src_proj),
        torch.from_numpy(ref_proj), torch.from_numpy(depths))

    ours = plane_sweep_warp(
        jnp.asarray(src_fea.transpose(0, 2, 3, 1)),
        jnp.asarray(src_proj), jnp.asarray(ref_proj), jnp.asarray(depths))
    # ours: [B, D, H, W, C] -> reference [B, C, D, H, W]
    ours_t = np.moveaxis(np.asarray(ours), -1, 1)
    np.testing.assert_allclose(ours_t, ref_out.numpy(), atol=1e-4, rtol=1e-4)


def test_warp_identity_camera(rng):
    """Warping from the same camera must reproduce the source feature for
    any depth (projection is identity). Uses align_corners=True: under the
    reference's default convention (normalize by (W-1)/2 but grid_sample
    align_corners=False) even the identity projection resamples at
    x*W/(W-1) - 0.5 — a known quirk we reproduce, not a bug here."""
    b, h, w, c, d = 1, 12, 14, 3, 4
    intr, projs = make_rig(batch=b, num_views=1, height=h, width=w)
    proj = np.einsum("bij,bjk->bik",
                     np.broadcast_to(np.block(
                         [[intr, np.zeros((3, 1), np.float32)],
                          [np.zeros((1, 3), np.float32), np.ones((1, 1), np.float32)]]),
                         (b, 4, 4)),
                     projs[:, 0, 0])
    fea = rng.standard_normal((b, h, w, c)).astype(np.float32)
    depths = np.linspace(2.0, 9.0, d, dtype=np.float32)[None]
    out = plane_sweep_warp(jnp.asarray(fea), jnp.asarray(proj),
                           jnp.asarray(proj), jnp.asarray(depths),
                           align_corners=True)
    for k in range(d):
        np.testing.assert_allclose(np.asarray(out)[:, k], fea, atol=1e-3)


# ---------------------------------------------------------------- sampling


def _reference_uncertainty_samples():
    return _import_reference_module().uncertainty_aware_samples


def test_uniform_samples_match_reference(rng):
    ref_fn = _reference_uncertainty_samples()
    b, d0, nd, h, w = 2, 192, 48, 8, 10
    dv = np.linspace(425.0, 900.0, d0, dtype=np.float32)[None].repeat(b, 0)
    ref = ref_fn(torch.from_numpy(dv), None, nd, torch.float32, "cpu", [b, h, w])
    ours = uniform_depth_samples(jnp.asarray(dv), nd, h, w)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-6)


def test_adia_samples_match_reference(rng):
    ref_fn = _reference_uncertainty_samples()
    b, nd, h, w = 2, 8, 6, 7
    cur = (400.0 + 100.0 * rng.random((b, 1, h, w))).astype(np.float32)
    sig = (5.0 + 20.0 * rng.random((b, 1, h, w))).astype(np.float32)
    ref = ref_fn(torch.from_numpy(cur), torch.from_numpy(sig), nd,
                 torch.float32, "cpu", [b, h, w])
    ours = adaptive_depth_samples(jnp.asarray(cur), jnp.asarray(sig), nd)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5, atol=1e-3)


# ---------------------------------------------------------------- regression


def test_depth_regression_matches_reference(rng):
    b, d, h, w = 2, 16, 5, 6
    logits = rng.standard_normal((b, d, h, w)).astype(np.float32)
    p = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    dv = np.linspace(400, 900, d, dtype=np.float32)[None].repeat(b, 0)
    ours = depth_regression(jnp.asarray(p), jnp.asarray(dv))
    ref = (p * dv[:, :, None, None]).sum(1)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5)


def test_prob_volume_stats_matches_reference_pipeline(rng):
    """Pin the full DepthNet tail: softmax -> depth, 4-tap window confidence
    gathered at the soft argmax, 3-sigma band (cas_mvsnet.py:105-124)."""
    b, d, h, w = 2, 16, 5, 6
    cost = rng.standard_normal((b, d, h, w)).astype(np.float32)
    dvals = np.sort(rng.random((b, d, h, w)).astype(np.float32) * 100 + 400, axis=1)

    ct = torch.from_numpy(cost)
    dt = torch.from_numpy(dvals)
    prob = TF.softmax(ct, dim=1)
    depth_ref = torch.sum(prob * dt, dim=1)
    sum4 = 4 * TF.avg_pool3d(
        TF.pad(prob.unsqueeze(1), (0, 0, 0, 0, 1, 2)), (4, 1, 1),
        stride=1, padding=0).squeeze(1)
    idx = torch.sum(prob * torch.arange(d, dtype=torch.float32)[None, :, None, None],
                    dim=1).long().clamp(0, d - 1)
    conf_ref = torch.gather(sum4, 1, idx.unsqueeze(1)).squeeze(1)
    sigma_ref = 3 * torch.sum((dt - depth_ref.unsqueeze(1)) ** 2 * prob, dim=1) ** 0.5

    out = prob_volume_stats(jnp.asarray(cost), jnp.asarray(dvals))
    np.testing.assert_allclose(np.asarray(out["depth"]), depth_ref.numpy(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["photometric_confidence"]),
                               conf_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["variance"]), sigma_ref.numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["prob_volume"]), prob.numpy(),
                               atol=1e-6)
