"""Cascade model: init + forward shape/sanity tests (tiny config)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from damvsnet_tpu.model import CascadeMVSNet
from conftest import make_rig

B, N, H, W = 1, 3, 32, 32
D0 = 16


def _batch(seed=0):
    rs = np.random.default_rng(seed)
    _, projs = make_rig(batch=B, num_views=N, height=H // 4, width=W // 4, seed=seed)
    proj_ms = {}
    intr_ms = {}
    for s in range(1, 4):
        p = projs.copy()
        p[:, :, 1, :2, :] *= 2.0 ** (s - 1)
        proj_ms[f"stage{s}"] = jnp.asarray(p)
        intr_ms[f"stage{s}"] = jnp.asarray(p[:, 0, 1, :3, :3])
    imgs = jnp.asarray(rs.random((B, N, H, W, 3)).astype(np.float32))
    depth_values = jnp.asarray(
        np.linspace(4.0, 8.0, D0, dtype=np.float32)[None].repeat(B, 0))
    return imgs, proj_ms, depth_values, intr_ms


@pytest.fixture(scope="module")
def tiny_model_outputs():
    model = CascadeMVSNet(ndepths=(8, 8, 8), cr_base_chs=(8, 8, 8))
    imgs, proj_ms, depth_values, intr_ms = _batch()
    variables = model.init(jax.random.PRNGKey(0), imgs, proj_ms, depth_values,
                           intr_ms, train=False)
    outputs = model.apply(variables, imgs, proj_ms, depth_values, intr_ms,
                          train=False)
    return model, variables, outputs


def test_forward_shapes(tiny_model_outputs):
    _, _, out = tiny_model_outputs
    for s, scale in (("stage1", 4), ("stage2", 2), ("stage3", 1)):
        assert out[s]["depth"].shape == (B, H // scale, W // scale)
        assert out[s]["photometric_confidence"].shape == (B, H // scale, W // scale)
        assert out[s]["variance"].shape == (B, H // scale, W // scale)
        assert out[s]["prob_volume"].shape == (B, 8, H // scale, W // scale)
        assert out[s]["depth_values"].shape == (B, 8, H // scale, W // scale)
    # final outputs mirror stage3 (cas_mvsnet.py:306-307)
    np.testing.assert_array_equal(np.asarray(out["depth"]),
                                  np.asarray(out["stage3"]["depth"]))


def test_forward_finite_and_in_range(tiny_model_outputs):
    _, _, out = tiny_model_outputs
    for s in ("stage1", "stage2", "stage3"):
        d = np.asarray(out[s]["depth"])
        assert np.isfinite(d).all()
        p = np.asarray(out[s]["prob_volume"])
        np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-4)
        c = np.asarray(out[s]["photometric_confidence"])
        assert (c >= -1e-5).all() and (c <= 1.0 + 1e-5).all()
    # stage-1 depths must lie within the sweep range
    d1 = np.asarray(out["stage1"]["depth"])
    assert d1.min() >= 4.0 - 1e-3 and d1.max() <= 8.0 + 1e-3


def test_train_mode_updates_batch_stats(tiny_model_outputs):
    model, variables, _ = tiny_model_outputs
    imgs, proj_ms, depth_values, intr_ms = _batch(1)
    out, mutated = model.apply(
        variables, imgs, proj_ms, depth_values, intr_ms, train=True,
        mutable=["batch_stats"])
    assert "batch_stats" in mutated
    leaves = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


def test_variance_agg_mode():
    model = CascadeMVSNet(ndepths=(8, 8, 8), agg_mode="variance",
                          use_geo_fusion=False)
    imgs, proj_ms, depth_values, intr_ms = _batch()
    variables = model.init(jax.random.PRNGKey(0), imgs, proj_ms, depth_values,
                           intr_ms, train=False)
    out = model.apply(variables, imgs, proj_ms, depth_values, intr_ms, train=False)
    assert out["stage3"]["depth"].shape == (B, H, W)
    assert np.isfinite(np.asarray(out["stage3"]["depth"])).all()


def test_fmt_variant():
    model = CascadeMVSNet(ndepths=(8, 8, 8), use_fmt=True, use_geo_fusion=False)
    imgs, proj_ms, depth_values, intr_ms = _batch()
    variables = model.init(jax.random.PRNGKey(0), imgs, proj_ms, depth_values,
                           intr_ms, train=False)
    out = model.apply(variables, imgs, proj_ms, depth_values, intr_ms, train=False)
    assert out["stage3"]["depth"].shape == (B, H, W)
    assert np.isfinite(np.asarray(out["stage3"]["depth"])).all()
    assert "fmt_pathway" in variables["params"]
