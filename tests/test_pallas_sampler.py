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
