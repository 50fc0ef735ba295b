"""Loss function tests: torch-parity for smooth-L1 / entropy formulas and
geometric self-consistency for inverse warping / CPC."""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

from damvsnet_tpu.losses import (  # noqa: E402
    inverse_warping, cross_view_loss, cas_mvsnet_loss,
    masked_smooth_l1, entropy_loss, info_entropy_loss, focal_loss_bld)
from conftest import make_rig  # noqa: E402


def _identity_cam(b, intr):
    cam = np.zeros((b, 2, 4, 4), np.float32)
    cam[:, 0] = np.eye(4)
    cam[:, 1, :3, :3] = intr
    return cam


def test_inverse_warping_identity(rng):
    b, h, w, c = 2, 10, 12, 3
    intr, _ = make_rig(batch=b, num_views=1, height=h, width=w)
    cam = jnp.asarray(_identity_cam(b, intr))
    img = jnp.asarray(rng.random((b, h, w, c)).astype(np.float32))
    depth = jnp.asarray((4 + rng.random((b, h, w))).astype(np.float32))
    warped, mask = inverse_warping(img, cam, cam, depth)
    m = np.asarray(mask)[..., 0]
    # Identity warp projects every pixel onto an exact integer coordinate,
    # where f32 K@K^-1 cancellation (~1e-6, same in the reference torch code)
    # can flip floor() across the boundary — so the validity mask has fuzz on
    # the x=0 / y=0 edges. Assert the meaningful property instead: the mask
    # covers (nearly) all interior pixels and values match wherever valid.
    assert m[:, 1:h - 1, 1:w - 1].all()
    valid = m > 0
    np.testing.assert_allclose(
        np.asarray(warped)[valid], np.asarray(img)[valid], atol=1e-4)


def test_masked_smooth_l1_matches_torch(rng):
    pred = rng.standard_normal((2, 8, 9)).astype(np.float32) * 3
    gt = rng.standard_normal((2, 8, 9)).astype(np.float32) * 3
    mask = rng.random((2, 8, 9)) > 0.4
    ref = TF.smooth_l1_loss(torch.from_numpy(pred)[torch.from_numpy(mask)],
                            torch.from_numpy(gt)[torch.from_numpy(mask)],
                            reduction="mean")
    ours = masked_smooth_l1(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_cpc_zero_for_identical_cameras(rng):
    """If all views share one camera, est-warp == gt-warp => CPC loss 0."""
    b, n, h, w = 1, 3, 16, 16
    intr, _ = make_rig(batch=b, num_views=1, height=h, width=w)
    cam = _identity_cam(b, intr)
    cams = {f"stage{s}": jnp.asarray(np.repeat(cam[:, None], n, axis=1))
            for s in (1, 2, 3)}
    imgs = jnp.asarray(rng.random((b, n, h, w, 3)).astype(np.float32))
    gt = {f"stage{s}": jnp.asarray(
        (5 + rng.random((b, h // 2 ** (3 - s), w // 2 ** (3 - s)))).astype(np.float32))
        for s in (1, 2, 3)}
    outputs = {f"stage{s}": {"depth": gt[f"stage{s}"]} for s in (1, 2, 3)}
    loss = cross_view_loss(outputs, imgs, cams, gt, (0.5, 1.0, 2.0))
    assert float(loss) < 1e-5


def test_cas_mvsnet_loss_composition(rng):
    b, n, h, w = 1, 3, 16, 16
    intr, _ = make_rig(batch=b, num_views=1, height=h, width=w)
    cam = _identity_cam(b, intr)
    cams = {f"stage{s}": jnp.asarray(np.repeat(cam[:, None], n, axis=1))
            for s in (1, 2, 3)}
    imgs = jnp.asarray(rng.random((b, n, h, w, 3)).astype(np.float32))
    gt, mask, outputs = {}, {}, {}
    for s in (1, 2, 3):
        hh, ww = h // 2 ** (3 - s), w // 2 ** (3 - s)
        gt[f"stage{s}"] = jnp.asarray((5 + rng.random((b, hh, ww))).astype(np.float32))
        mask[f"stage{s}"] = jnp.ones((b, hh, ww), jnp.float32)
        outputs[f"stage{s}"] = {"depth": gt[f"stage{s}"] + 0.5}
    total, dl, cpc = cas_mvsnet_loss(outputs, imgs, cams, gt, mask)
    # depth err 0.5 => smooth_l1 = 0.125 per stage; weights 0.5+1+2 = 3.5
    np.testing.assert_allclose(float(dl), 0.125, rtol=1e-5)
    np.testing.assert_allclose(float(total) - 12 * float(cpc), 0.125 * 3.5, rtol=1e-4)


def test_entropy_loss_matches_torch(rng):
    b, d, h, w = 2, 8, 6, 7
    logits = rng.standard_normal((b, d, h, w)).astype(np.float32)
    prob = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    dv = np.linspace(4, 8, d, dtype=np.float32)[None].repeat(b, 0)
    depth_gt = (4 + 4 * rng.random((b, h, w))).astype(np.float32)
    mask = (rng.random((b, h, w)) > 0.3).astype(np.float32)

    # reference formula (module.py:755-790) recomputed in torch
    pt = torch.from_numpy(prob)
    dvm = torch.from_numpy(dv).repeat(h, w, 1, 1).permute(2, 3, 0, 1)
    gt_idx = torch.argmin(torch.abs(dvm - torch.from_numpy(depth_gt).unsqueeze(1)), dim=1)
    gt_idx = torch.round(torch.from_numpy(mask) * gt_idx.float()).long().unsqueeze(1)
    onehot = torch.zeros(b, d, h, w).scatter_(1, gt_idx, 1)
    ce = -torch.sum(onehot * torch.log(pt + 1e-6), dim=1)
    ref = torch.mean(torch.sum(torch.from_numpy(mask) * ce, dim=[1, 2])
                     / (torch.sum(torch.from_numpy(mask), dim=[1, 2]) + 1e-6))
    wta_ref = torch.gather(dvm, 1, torch.argmax(pt, 1, keepdim=True)).squeeze(1)

    ours, wta = entropy_loss(jnp.asarray(prob), jnp.asarray(depth_gt),
                             jnp.asarray(mask), jnp.asarray(dv))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(wta), wta_ref.numpy(), rtol=1e-6)


def test_info_entropy_loss_finite(rng):
    b, d, h, w = 1, 8, 6, 7
    pre = jnp.asarray(rng.standard_normal((b, d, h, w)).astype(np.float32))
    prob = jnp.exp(pre) / jnp.exp(pre).sum(1, keepdims=True)
    mask = jnp.ones((b, h, w))
    v = info_entropy_loss(prob, pre, mask)
    assert np.isfinite(float(v)) and float(v) > 0


def test_focal_loss_bld(rng):
    b, d, h, w = 1, 8, 8, 8
    outputs, gt, mask = {}, {}, {}
    for s in (1, 2, 3):
        logits = rng.standard_normal((b, d, h, w)).astype(np.float32)
        prob = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
        dv = np.broadcast_to(
            np.linspace(4, 8, d, dtype=np.float32)[None, :, None, None],
            (b, d, h, w)).copy()
        outputs[f"stage{s}"] = {
            "prob_volume": jnp.asarray(prob),
            "depth_values": jnp.asarray(dv),
            "depth": jnp.asarray((prob * dv).sum(1)),
        }
        gt[f"stage{s}"] = jnp.asarray((4 + 4 * rng.random((b, h, w))).astype(np.float32))
        mask[f"stage{s}"] = jnp.ones((b, h, w), jnp.float32)
    total, dl, epe, less1, less3 = focal_loss_bld(outputs, gt, mask, 0.1)
    for v in (total, dl, epe, less1, less3):
        assert np.isfinite(float(v))
    assert 0 <= float(less1) <= 1 and 0 <= float(less3) <= 1
