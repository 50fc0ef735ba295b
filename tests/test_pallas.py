"""Pallas kernels vs their XLA reference implementations (interpret mode on
CPU; the same kernels compile natively on TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from damvsnet_tpu.ops.regression import prob_volume_stats
from damvsnet_tpu.ops.pallas.probstats import prob_volume_stats_pallas


def test_probstats_kernel_matches_xla(rng):
    b, d, h, w = 2, 16, 8, 16
    cost = rng.standard_normal((b, d, h, w)).astype(np.float32)
    dv = np.sort(400 + 100 * rng.random((b, d, h, w)).astype(np.float32), axis=1)
    ref = prob_volume_stats(jnp.asarray(cost), jnp.asarray(dv))
    out = prob_volume_stats_pallas(jnp.asarray(cost), jnp.asarray(dv),
                                   interpret=True)
    for k in ("depth", "photometric_confidence", "variance"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["prob_volume"]),
                               np.asarray(ref["prob_volume"]), atol=1e-6)


def test_probstats_kernel_broadcast_depth_values(rng):
    b, d, h, w = 1, 8, 8, 24
    cost = rng.standard_normal((b, d, h, w)).astype(np.float32)
    dv = np.linspace(400, 900, d, dtype=np.float32)[None].repeat(b, 0)
    ref = prob_volume_stats(jnp.asarray(cost), jnp.asarray(dv))
    out = prob_volume_stats_pallas(jnp.asarray(cost), jnp.asarray(dv),
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               np.asarray(ref["depth"]), rtol=1e-4)


def test_stats_kernel_wired_into_model():
    """stats_kernel='pallas' (interpret on CPU) produces the same cascade
    outputs as the XLA stats tail — the wiring contract for the fused
    inference path in model/cascade.py."""
    from conftest import make_rig
    from damvsnet_tpu.model import CascadeMVSNet
    rng = np.random.default_rng(2)
    B, N, H, W = 1, 2, 32, 32
    _, projs = make_rig(batch=B, num_views=N, height=H // 4, width=W // 4)
    proj_ms = {}
    for s in range(1, 4):
        p = projs.copy()
        p[:, :, 1, :2, :] *= 2.0 ** (s - 1)
        proj_ms[f"stage{s}"] = jnp.asarray(p)
    imgs = jnp.asarray(rng.random((B, N, H, W, 3)).astype(np.float32))
    dvals = jnp.asarray(np.linspace(4, 8, 8, dtype=np.float32)[None])

    base = CascadeMVSNet(ndepths=(8, 8, 8), use_geo_fusion=False,
                         stats_kernel="xla")
    variables = base.init(jax.random.PRNGKey(0), imgs, proj_ms, dvals, None,
                          train=False)
    ref = base.apply(variables, imgs, proj_ms, dvals, None, train=False)

    fused = CascadeMVSNet(ndepths=(8, 8, 8), use_geo_fusion=False,
                          stats_kernel="pallas",
                          sampler="xla", sampler_opts={"interpret": True})
    out = fused.apply(variables, imgs, proj_ms, dvals, None, train=False)
    for key in ("depth", "photometric_confidence", "variance"):
        np.testing.assert_allclose(np.asarray(out[key]),
                                   np.asarray(ref[key]),
                                   rtol=1e-5, atol=1e-5)
