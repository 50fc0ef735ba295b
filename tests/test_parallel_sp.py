"""Sequence-parallel FMT attention + depth-slab-sharded cost volume on the
8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from damvsnet_tpu.parallel import make_mesh, sequence_parallel_linear_attention
from damvsnet_tpu.nn.fmt import linear_attention
from conftest import make_rig


def test_sequence_parallel_attention_matches_local(rng):
    mesh = make_mesh(data=1, space=len(jax.devices()))
    b, l, h, d = 2, 8 * 16, 4, 8
    q = jnp.asarray(rng.standard_normal((b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, l, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, l, h, d)).astype(np.float32))
    ref = linear_attention(q, k, v)
    with mesh:
        out = sequence_parallel_linear_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_depth_slab_sharded_model():
    """slab_axis='space': cost volumes shard their D axis over the mesh;
    the forward compiles and matches the unsharded model."""
    from damvsnet_tpu.model import CascadeMVSNet
    rng = np.random.default_rng(0)
    B, N, H, W = 1, 3, 32, 32
    _, projs = make_rig(batch=B, num_views=N, height=H // 4, width=W // 4)
    proj_ms = {}
    for s in range(1, 4):
        p = projs.copy()
        p[:, :, 1, :2, :] *= 2.0 ** (s - 1)
        proj_ms[f"stage{s}"] = jnp.asarray(p)
    imgs = jnp.asarray(rng.random((B, N, H, W, 3)).astype(np.float32))
    dvals = jnp.asarray(np.linspace(4, 8, 16, dtype=np.float32)[None])

    base = CascadeMVSNet(ndepths=(8, 8, 8), use_geo_fusion=False)
    variables = base.init(jax.random.PRNGKey(0), imgs, proj_ms, dvals, None,
                          train=False)
    ref = base.apply(variables, imgs, proj_ms, dvals, None, train=False)

    mesh = make_mesh(data=len(jax.devices()) // 2, space=2)
    sharded = CascadeMVSNet(ndepths=(8, 8, 8), use_geo_fusion=False,
                            slab_axis="space")

    @jax.jit
    def fwd(variables, imgs, proj_ms, dvals):
        out = sharded.apply(variables, imgs, proj_ms, dvals, None, train=False)
        return out["stage3"]["depth"]

    with mesh:
        d = fwd(variables, imgs, proj_ms, dvals)
    np.testing.assert_allclose(np.asarray(d),
                               np.asarray(ref["stage3"]["depth"]),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_fmt_sp_wired_into_model():
    """fmt_sp_axis='space': the FMT pathway's attention runs sequence-
    parallel under the mesh and matches the unsharded model exactly."""
    from damvsnet_tpu.model import CascadeMVSNet
    rng = np.random.default_rng(1)
    B, N, H, W = 1, 3, 32, 32
    _, projs = make_rig(batch=B, num_views=N, height=H // 4, width=W // 4)
    proj_ms = {}
    for s in range(1, 4):
        p = projs.copy()
        p[:, :, 1, :2, :] *= 2.0 ** (s - 1)
        proj_ms[f"stage{s}"] = jnp.asarray(p)
    imgs = jnp.asarray(rng.random((B, N, H, W, 3)).astype(np.float32))
    dvals = jnp.asarray(np.linspace(4, 8, 16, dtype=np.float32)[None])

    base = CascadeMVSNet(ndepths=(8, 8, 8), use_geo_fusion=False,
                         use_fmt=True)
    variables = base.init(jax.random.PRNGKey(0), imgs, proj_ms, dvals, None,
                          train=False)
    ref = base.apply(variables, imgs, proj_ms, dvals, None, train=False)

    mesh = make_mesh(data=1, space=len(jax.devices()))
    sp = CascadeMVSNet(ndepths=(8, 8, 8), use_geo_fusion=False,
                       use_fmt=True, fmt_sp_axis="space")

    @jax.jit
    def fwd(variables, imgs, proj_ms, dvals):
        out = sp.apply(variables, imgs, proj_ms, dvals, None, train=False)
        return out["stage3"]["depth"]

    with mesh:
        d = fwd(variables, imgs, proj_ms, dvals)
    np.testing.assert_allclose(np.asarray(d),
                               np.asarray(ref["stage3"]["depth"]),
                               rtol=1e-4, atol=1e-4)
