"""Depth-block repacking (ops/depthblock.py): exactness vs plain execution.

Integer-valued inputs/kernels make every check structural (any mismatch is
a wiring bug, not rounding) — important because XLA CPU's own conv
lowering is imprecise for narrow channel counts (measured 1.3e-2 vs a
float64 oracle for a Cout=1 conv3d), so float comparisons against
lax.conv would bound the tolerance by the *reference's* sloppiness.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from damvsnet_tpu.nn.blocks import conv_transpose_torch
from damvsnet_tpu.ops.depthblock import (conv3d_repacked, deconv3d_repacked,
                                         level_blocks, repack, unpack)


def _int_arr(rng, shape):
    return jnp.asarray(rng.integers(-3, 4, shape).astype(np.float32))


def test_repack_roundtrip(rng):
    x = _int_arr(rng, (2, 16, 3, 5, 4))
    for b in (1, 2, 4, 8, 16):
        np.testing.assert_array_equal(unpack(repack(x, b), b), x)


@pytest.mark.parametrize("d,bi,bo,sd", [
    (16, 4, 4, 1),   # stride-1, same block
    (16, 4, 4, 2),   # stride-2, block count halves
    (16, 4, 2, 2),   # stride-2, block size halves
    (12, 4, 2, 2),   # non-pow2 depth (training D=48 ladder)
    (2, 2, 1, 2),    # bottom of the stage-3 ladder
])
def test_conv3d_repacked_exact(rng, d, bi, bo, sd):
    x = _int_arr(rng, (1, d, 6, 8, 3))
    w = _int_arr(rng, (3, 3, 3, 3, 5))
    want = jax.lax.conv_general_dilated(
        x, w, (sd, 1, 1), ((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = unpack(conv3d_repacked(repack(x, bi), w, block_in=bi, block_out=bo,
                                 stride_d=sd, stride_hw=1, pad_hw=1), bo)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("d,bi,bo", [
    (8, 4, 4),   # block count doubles
    (4, 4, 8),   # single block, size doubles
    (6, 2, 4),   # multi-block size-doubling (training D=48 ladder)
    (1, 1, 2),   # bottom of the stage-3 ladder
])
def test_deconv3d_repacked_exact(rng, d, bi, bo):
    x = _int_arr(rng, (1, d, 3, 5, 3))
    w = _int_arr(rng, (3, 3, 3, 3, 4))
    want = conv_transpose_torch(x, w, 2, 1, 1)
    got = unpack(deconv3d_repacked(repack(x, bi), w, block_in=bi,
                                   block_out=bo), bo)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("h,bi,bo,s,k", [
    (16, 4, 4, 1, 3),   # FPN 3x3 trunk conv
    (16, 4, 4, 1, 5),   # 5x5 stride-1 (geofusion init convs)
    (16, 4, 2, 2, 5),   # FPN 5x5 stride-2 downsample, block size halves
    (16, 4, 4, 2, 5),   # 5x5 stride-2, block count halves (needs KQ=4 —
                        # a fixed 3-block window drops the last slot's tap)
    (16, 8, 8, 1, 3),
])
def test_conv2d_repacked_exact(rng, h, bi, bo, s, k):
    from damvsnet_tpu.ops.depthblock import conv2d_repacked, repack2d, unpack2d
    x = _int_arr(rng, (1, h, 10, 3))
    w = _int_arr(rng, (k, k, 3, 5))
    p = (k - 1) // 2
    want = jax.lax.conv_general_dilated(
        x, w, (s, s), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = unpack2d(conv2d_repacked(repack2d(x, bi), w, block_in=bi,
                                   block_out=bo, stride=s, pad_w=p), bo)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("h,bi,bo", [(8, 4, 4), (8, 4, 8), (4, 4, 8)])
def test_deconv2d_repacked_exact(rng, h, bi, bo):
    from damvsnet_tpu.ops.depthblock import (deconv2d_repacked, repack2d,
                                             unpack2d)
    x = _int_arr(rng, (1, h, 5, 3))
    w = _int_arr(rng, (3, 3, 3, 4))
    want = conv_transpose_torch(x, w, 2, 1, 1)
    got = unpack2d(deconv2d_repacked(repack2d(x, bi), w, block_in=bi,
                                     block_out=bo), bo)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_featurenet_height_block_parity(rng):
    from damvsnet_tpu.nn.feature import FeatureNet
    x = jnp.asarray(rng.random((1, 32, 24, 3), np.float32))
    plain = FeatureNet(base_channels=8, height_block=0)
    packed = FeatureNet(base_channels=8, height_block=8)
    v = plain.init(jax.random.PRNGKey(0), x, False)
    assert (jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        packed.init(jax.random.PRNGKey(0), x, False)))
    y0 = plain.apply(v, x, False)
    y1 = packed.apply(v, x, False)
    for s in ("stage1", "stage2", "stage3"):
        np.testing.assert_allclose(np.asarray(y0[s]), np.asarray(y1[s]),
                                   rtol=0, atol=2e-2)


def test_level_blocks():
    assert level_blocks(64, 16) == [16, 16, 16, 8]
    assert level_blocks(48, 16) == [16, 8, 4, 2]
    assert level_blocks(8, 8) == [8, 4, 2, 1]
    assert level_blocks(8, 16) == [8, 4, 2, 1]
    assert level_blocks(12, 16) is None  # 12/4 = 3 -> /8 not integral
    assert level_blocks(64, 1) is None


def test_costregnet_depth_block_parity(rng):
    """Full U-Net: repacked vs plain with identical params. Tolerance is
    bounded by XLA CPU's conv imprecision, not by the repacking (the
    primitive tests above are bit-exact)."""
    from damvsnet_tpu.nn.costreg import CostRegNet
    x = jnp.asarray(rng.random((1, 16, 8, 8, 4), np.float32))
    plain = CostRegNet(base_channels=4, depth_block=0)
    packed = CostRegNet(base_channels=4, depth_block=4)
    v = plain.init(jax.random.PRNGKey(0), x, False)
    y0 = plain.apply(v, x, False)
    y1 = packed.apply(v, x, False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=0, atol=5e-2)
    # same param tree serves both paths (checkpoint compatibility)
    v2 = packed.init(jax.random.PRNGKey(0), x, False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))
    # gradients flow through the repacked path
    g = jax.grad(lambda p: float(0) + jnp.sum(
        packed.apply({**v, "params": p}, x, False) ** 2))(v["params"])
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(g))
