"""Fused adaptive cost-volume kernel: parity vs the XLA path.

Interpreter mode on CPU. Parity targets: ops.costvol.build_cost_volume
(mode="adaptive", itself golden-tested vs the reference DepthNet
aggregation) and the full cascade forward with sampler="xla".
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from damvsnet_tpu.nn.aggweight import AggWeightNetVolume, fold_aggweight
from damvsnet_tpu.ops.costvol import build_cost_volume
from damvsnet_tpu.ops.pallas.fused_costvol import fused_adaptive_cost_volume
from conftest import make_rig

B, H, W, C, D, V = 1, 24, 32, 8, 4, 3


def _fused_projs(num_views):
    _, projs = make_rig(batch=B, num_views=num_views, height=H, width=W)
    fused = []
    for v in range(num_views):
        f = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
        f[:, :3, :4] = np.einsum("bij,bjk->bik", projs[:, v, 1, :3, :3],
                                 projs[:, v, 0, :3, :4])
        fused.append(jnp.asarray(f))
    return fused


@pytest.fixture(scope="module")
def wnet():
    net = AggWeightNetVolume()
    variables = net.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 1, 1, C)),
                         False)
    # non-trivial BN stats so the folding is actually exercised
    variables = jax.tree_util.tree_map(lambda x: x, variables)
    bs = jax.tree_util.tree_map(
        lambda x: x + 0.3 * jnp.arange(x.size, dtype=x.dtype).reshape(x.shape),
        variables["batch_stats"])
    return net, {"params": variables["params"], "batch_stats": bs}


def test_fold_aggweight_matches_module(rng, wnet):
    net, variables = wnet
    x = jnp.asarray(rng.random((2, 3, 4, 5, C)).astype(np.float32))
    want = net.apply(variables, x, False)  # eval mode, running stats
    w1, b1, w2, b2 = fold_aggweight(variables)
    s = jnp.maximum(jnp.einsum("bdhwc,c->bdhw", x, w1)[..., None] + b1, 0.0)
    got = jnp.maximum(w2 * s + b2, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("per_pixel", [False, True])
def test_fused_volume_matches_xla(rng, wnet, per_pixel):
    net, variables = wnet
    projs = _fused_projs(V + 1)
    ref_p, src_ps = projs[0], projs[1:]
    feas = [jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
            for _ in range(V + 1)]
    if per_pixel:
        dv = jnp.asarray((4 + 4 * rng.random((B, D, H, W))).astype(np.float32))
    else:
        dv = jnp.asarray(np.linspace(4, 8, D, dtype=np.float32)[None])

    weight_fn = lambda vol: net.apply(variables, vol, False)
    want = build_cost_volume(feas[0], feas[1:], ref_p, src_ps, dv,
                             mode="adaptive", weight_fn=weight_fn,
                             sampler="xla")
    w1, b1, w2, b2 = fold_aggweight(variables)
    got, overflow = fused_adaptive_cost_volume(
        feas[0], feas[1:], ref_p, src_ps, dv, w1, b1, w2, b2,
        wb=W, band_rows=H, interpret=True)
    assert int(np.asarray(overflow).sum()) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


@pytest.mark.parametrize("dd,grp", [(12, 8), (5, 8), (4, 1)])
def test_fused_volume_depth_groups(rng, wnet, dd, grp):
    """Depth-group batching: D=12/group=8 picks g=6 (largest divisor in
    budget), D=5 runs whole-sweep groups, group=1 is the ungrouped path —
    all must match the XLA oracle exactly like the default grouping."""
    net, variables = wnet
    projs = _fused_projs(V + 1)
    ref_p, src_ps = projs[0], projs[1:]
    feas = [jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
            for _ in range(V + 1)]
    dv = jnp.asarray(np.linspace(4, 8, dd, dtype=np.float32)[None])

    weight_fn = lambda vol: net.apply(variables, vol, False)
    want = build_cost_volume(feas[0], feas[1:], ref_p, src_ps, dv,
                             mode="adaptive", weight_fn=weight_fn,
                             sampler="xla")
    w1, b1, w2, b2 = fold_aggweight(variables)
    got, overflow = fused_adaptive_cost_volume(
        feas[0], feas[1:], ref_p, src_ps, dv, w1, b1, w2, b2,
        wb=W, band_rows=H, depth_group=grp, interpret=True)
    assert int(np.asarray(overflow).sum()) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


@pytest.mark.parametrize("narrow_wb,narrow_rows", [(8, 1), (16, 4), (W, H)])
def test_two_tier_matches_xla(rng, wnet, narrow_wb, narrow_rows):
    """Per-cell adaptive band sizing: whatever mix of cells the narrow
    pass handles vs flags for the wide repair pass — all-flagged (tiny
    narrow windows), mixed, or none-flagged (narrow == wide) — the merged
    volume must equal the XLA oracle and report zero residual overflow."""
    net, variables = wnet
    projs = _fused_projs(V + 1)
    ref_p, src_ps = projs[0], projs[1:]
    feas = [jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
            for _ in range(V + 1)]
    dv = jnp.asarray((4 + 4 * rng.random((B, D, H, W))).astype(np.float32))

    weight_fn = lambda vol: net.apply(variables, vol, False)
    want = build_cost_volume(feas[0], feas[1:], ref_p, src_ps, dv,
                             mode="adaptive", weight_fn=weight_fn,
                             sampler="xla")
    w1, b1, w2, b2 = fold_aggweight(variables)
    got, overflow = fused_adaptive_cost_volume(
        feas[0], feas[1:], ref_p, src_ps, dv, w1, b1, w2, b2,
        wb=W, band_rows=H, two_tier=True, narrow_wb=narrow_wb,
        narrow_band_rows=narrow_rows, interpret=True)
    assert int(np.asarray(overflow).sum()) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


@pytest.mark.parametrize("two_tier", [False, True])
def test_x_subtiles_match_xla(rng, wnet, two_tier):
    """x-subtiling (XS=2: per-half windows, subtile-major lane packing,
    narrower resolve matmuls) must be value-identical to the oracle, with
    and without the two-tier composition."""
    net, variables = wnet
    projs = _fused_projs(V + 1)
    ref_p, src_ps = projs[0], projs[1:]
    feas = [jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
            for _ in range(V + 1)]
    dv = jnp.asarray((4 + 4 * rng.random((B, D, H, W))).astype(np.float32))

    weight_fn = lambda vol: net.apply(variables, vol, False)
    want = build_cost_volume(feas[0], feas[1:], ref_p, src_ps, dv,
                             mode="adaptive", weight_fn=weight_fn,
                             sampler="xla")
    w1, b1, w2, b2 = fold_aggweight(variables)
    got, overflow = fused_adaptive_cost_volume(
        feas[0], feas[1:], ref_p, src_ps, dv, w1, b1, w2, b2,
        wb=W, band_rows=H, x_subtiles=2, sub_wb=24, depth_group=8,
        two_tier=two_tier, narrow_wb=W, narrow_band_rows=H,
        interpret=True)
    assert int(np.asarray(overflow).sum()) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


def test_two_tier_narrow_pass_flags_cells(rng, wnet):
    """The narrow pass's per-cell map must actually flag cells when its
    windows are too small (the repair pass has work to do) and be all-
    clear when narrow == wide."""
    from damvsnet_tpu.ops.pallas.fused_costvol import (
        _fused_adaptive_volume, geom_from_projs)

    net, variables = wnet
    projs = _fused_projs(V + 1)
    ref_p, src_ps = projs[0], projs[1:]
    feas = [jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
            for _ in range(V + 1)]
    dv = jnp.broadcast_to(
        jnp.asarray(np.linspace(4, 8, D, dtype=np.float32))[None, :, None,
                                                            None],
        (B, D, H, W))
    w1, b1, w2, b2 = fold_aggweight(variables)
    src_stack = jnp.stack(feas[1:])
    geom = jnp.stack([geom_from_projs(sp, ref_p) for sp in src_ps])
    ref_packed = jnp.transpose(feas[0], (0, 1, 3, 2)).reshape(B, H * C, W)
    scalars = jnp.stack([jnp.asarray(b1, jnp.float32),
                         jnp.asarray(w2, jnp.float32),
                         jnp.asarray(b2, jnp.float32),
                         jnp.asarray(1.0 / V, jnp.float32)])
    w1v = jnp.asarray(w1, jnp.float32).reshape(C, 1)

    _, _, ofmap_tiny = _fused_adaptive_volume(
        src_stack, geom, ref_packed, dv, w1v, scalars,
        wb=8, band_rows=1, interpret=True, ofmap_mode=1)
    assert int(np.asarray(ofmap_tiny).sum()) > 0

    _, _, ofmap_full = _fused_adaptive_volume(
        src_stack, geom, ref_packed, dv, w1v, scalars,
        wb=W, band_rows=H, interpret=True, ofmap_mode=1)
    assert int(np.asarray(ofmap_full).sum()) == 0


@pytest.mark.parametrize("opts", [
    {"interpret": True},
    # serving-config shape: per-stage two-tier dicts (infer/serving.py)
    {"interpret": True, "two_tier": True,
     "stage1": {"narrow_wb": 16, "narrow_band_rows": 4},
     "stage2": {"narrow_wb": 24, "narrow_band_rows": 8},
     "stage3": {"narrow_wb": 32, "narrow_band_rows": 8}},
])
def test_cascade_fused_matches_xla(rng, opts):
    """Full-model wiring: sampler='pallas' (fused adaptive path, folded
    weights pulled from the bound submodule) vs sampler='xla', with and
    without the per-stage two-tier serving opts."""
    from damvsnet_tpu.model import CascadeMVSNet

    b, n, h, w = 1, 3, 32, 32
    _, projs = make_rig(batch=b, num_views=n, height=h // 4, width=w // 4)
    proj_ms = {}
    for s in range(1, 4):
        p = projs.copy()
        p[:, :, 1, :2, :] *= 2.0 ** (s - 1)
        proj_ms[f"stage{s}"] = jnp.asarray(p)
    imgs = jnp.asarray(rng.random((b, n, h, w, 3)).astype(np.float32))
    dv = jnp.asarray(np.linspace(4.0, 8.0, 8, dtype=np.float32)[None])

    kw = dict(ndepths=(8, 8, 8), cr_base_chs=(8, 8, 8), use_geo_fusion=False)
    pall = CascadeMVSNet(sampler="pallas", sampler_opts=opts, **kw)
    variables = pall.init(jax.random.PRNGKey(0), imgs, proj_ms, dv,
                          train=False)
    got = pall.apply(variables, imgs, proj_ms, dv, train=False)
    assert int(got["sampler_overflow"]) == 0

    xla = CascadeMVSNet(sampler="xla", **kw)
    want = xla.apply(variables, imgs, proj_ms, dv, train=False)
    np.testing.assert_allclose(np.asarray(got["depth"]),
                               np.asarray(want["depth"]), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got["photometric_confidence"]),
        np.asarray(want["photometric_confidence"]), atol=1e-4)
