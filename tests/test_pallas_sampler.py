"""Banded Pallas plane-sweep sampler: parity vs the XLA gather path.

Runs the kernel in interpreter mode on the CPU mesh (conftest), exercising
the same code path the TPU compiles. Parity target: the reference
``homo_warping`` + ``F.grid_sample(zeros)`` numerics, via the already
golden-tested XLA implementation (tests/test_ops_parity.py).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from damvsnet_tpu.ops.warp import plane_sweep_warp
from damvsnet_tpu.ops.pallas.sweep_sampler import plane_sweep_warp_pallas
from conftest import make_rig

B, H, W, C, D = 2, 24, 32, 8, 4


def _rig():
    _, projs = make_rig(batch=B, num_views=2, height=H, width=W)

    def fuse(p):
        f = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
        f[:, :3, :4] = np.einsum("bij,bjk->bik", p[:, 1, :3, :3],
                                 p[:, 0, :3, :4])
        return jnp.asarray(f)

    return fuse(projs[:, 0]), fuse(projs[:, 1])


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("per_pixel", [False, True])
def test_band_sampler_matches_xla(rng, align_corners, per_pixel):
    ref_p, src_p = _rig()
    src_fea = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    if per_pixel:
        dv = jnp.asarray((4 + 4 * rng.random((B, D, H, W))).astype(np.float32))
    else:
        dv = jnp.asarray(np.linspace(4, 8, D, dtype=np.float32)[None].repeat(B, 0))
    want = plane_sweep_warp(src_fea, src_p, ref_p, dv,
                            align_corners=align_corners)
    got, overflow = plane_sweep_warp_pallas(
        src_fea, src_p, ref_p, dv, align_corners=align_corners,
        wb=W, band_rows=H, interpret=True, return_overflow=True)
    assert int(overflow.sum()) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


def test_band_sampler_overflow_flag(rng):
    """A window too small for the rig's spread must raise the flag, and
    dropped taps must only ever reduce contributions (never misread)."""
    ref_p, src_p = _rig()
    src_fea = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    dv = jnp.asarray(np.linspace(4, 8, D, dtype=np.float32)[None].repeat(B, 0))
    got, overflow = plane_sweep_warp_pallas(
        src_fea, src_p, ref_p, dv, wb=8, band_rows=8, interpret=True,
        return_overflow=True)
    assert int(overflow.sum()) > 0
    assert bool(jnp.isfinite(got).all())


def test_band_sampler_multiblock_default_windows(rng):
    """W >= 256 with the production wb/band_rows defaults: exercises
    multiple 128-lane x-blocks (nxb > 1), the per-row sub-band slicing and
    the lookahead DMA staging — the configuration actually used on TPU.

    Uses a realistic narrow-FOV rig (focal ~ image width, like DTU) —
    make_rig's fixed focal 15 at W=384 is a fisheye whose homography
    x-spread exceeds any sane band window."""
    wm = 384
    intr = np.array([[0.8 * wm, 0.0, wm / 2],
                     [0.0, 0.8 * wm, H / 2],
                     [0.0, 0.0, 1.0]], dtype=np.float32)
    projs = []
    for v in range(2):
        a = 0.05 * v
        ca, sa = np.cos(a), np.sin(a)
        ext = np.eye(4, dtype=np.float32)
        ext[:3, :3] = np.array([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]],
                               np.float32)
        ext[:3, 3] = [0.3 * v, 0.1 * v, 0.0]
        p = np.zeros((2, 4, 4), np.float32)
        p[0] = ext
        p[1, :3, :3] = intr
        projs.append(p)
    projs = np.stack(projs)[None]  # [1, V, 2, 4, 4]

    def fuse(p):
        f = np.broadcast_to(np.eye(4, dtype=np.float32), (1, 4, 4)).copy()
        f[:, :3, :4] = np.einsum("bij,bjk->bik", p[:, 1, :3, :3],
                                 p[:, 0, :3, :4])
        return jnp.asarray(f)

    ref_p, src_p = fuse(projs[:, 0]), fuse(projs[:, 1])
    src_fea = jnp.asarray(rng.standard_normal((1, H, wm, C)).astype(np.float32))
    dv = jnp.asarray(np.linspace(4, 8, D, dtype=np.float32)[None])
    want = plane_sweep_warp(src_fea, src_p, ref_p, dv)
    got, overflow = plane_sweep_warp_pallas(
        src_fea, src_p, ref_p, dv, interpret=True, return_overflow=True)
    assert int(overflow.sum()) == 0
    # coordinate arithmetic differs in association from the XLA path; at
    # W=384 the f32 rounding of ~1e5-scale intermediates leaves ~1e-3 px
    # coordinate jitter -> O(1e-4) feature error on unit-variance features
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def test_sampler_supported_constraints():
    from damvsnet_tpu.ops.warp import pallas_sampler_supported
    ok = jnp.zeros((1, 16, 32, 8), jnp.float32)
    bad_h = jnp.zeros((1, 30, 32, 8), jnp.float32)  # H % 8 != 0
    bad_c = jnp.zeros((1, 16, 32, 5), jnp.float32)  # 128 % C != 0
    assert pallas_sampler_supported(ok, backend="tpu")
    assert not pallas_sampler_supported(bad_h, backend="tpu")
    assert not pallas_sampler_supported(bad_c, backend="tpu")
    assert not pallas_sampler_supported(ok, backend="cpu")


def test_runner_overflow_fallback(rng):
    """A failing pallas window config through the full model must raise the
    overflow flag, and DepthRunner must transparently redo the batch with
    the XLA sampler (VERDICT r1 item 3: no silent experimental default)."""
    import jax
    from damvsnet_tpu.model import CascadeMVSNet
    from damvsnet_tpu.infer.runner import DepthRunner

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
    bad = CascadeMVSNet(sampler="pallas",
                        sampler_opts={"wb": 8, "band_rows": 8,
                                      "interpret": True}, **kw)
    variables = bad.init(jax.random.PRNGKey(0), imgs, proj_ms, dv, train=False)

    logs = []
    runner = DepthRunner(bad, variables, log_fn=logs.append)
    out = runner({"imgs": imgs, "proj_matrices": proj_ms, "depth_values": dv})
    assert runner.overflow_batches == 1 and logs  # flagged + warned

    # the delivered result is the XLA redo, not the degraded pallas one
    ref_model = CascadeMVSNet(sampler="xla", **kw)
    want = jax.device_get(ref_model.apply(variables, imgs, proj_ms, dv,
                                          train=False))
    assert int(want["sampler_overflow"]) == 0
    # jit-vs-eager fusion differences leave a few-ulp float32 residue
    np.testing.assert_allclose(out["depth"], want["depth"], atol=5e-5)


def test_band_sampler_zero_weight_outside_image(rng):
    """A camera looking away samples nothing -> all-zero output."""
    ref_p, _ = _rig()
    src_fea = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    away = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
    away[:, 0, 3] = 1e6  # shift far off-image
    dv = jnp.asarray(np.linspace(4, 8, D, dtype=np.float32)[None].repeat(B, 0))
    got = plane_sweep_warp_pallas(src_fea, jnp.asarray(away), ref_p, dv,
                                  wb=W, band_rows=H, interpret=True)
    np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-6)
