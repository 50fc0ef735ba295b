"""Pallas kernels vs their XLA reference implementations (interpret mode on
CPU; the same kernels compile natively on TPU)."""
import numpy as np
import pytest

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
