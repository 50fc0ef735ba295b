"""Test configuration: force an 8-device virtual CPU mesh.

Must set XLA flags before jax initializes its backends, so this lives at
module import time of conftest (pytest imports it before any test module).
"""
import os

# Force the 8-device CPU mesh unless explicitly testing on TPU hardware.
# The env may pre-set JAX_PLATFORMS to a TPU plugin via sitecustomize, and
# env edits after interpreter start are too late for platform selection —
# use jax.config (backends initialize lazily, so this still applies).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
if not os.environ.get("DAMVSNET_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_rig(batch=1, num_views=3, height=16, width=20, seed=0):
    """A tiny synthetic camera rig: ref camera at origin, sources offset with
    small rotations; plane-ish scene depth range [4, 8]."""
    rs = np.random.default_rng(seed)
    intr = np.array([[15.0, 0.0, width / 2],
                     [0.0, 15.0, height / 2],
                     [0.0, 0.0, 1.0]], dtype=np.float32)
    projs = []
    for v in range(num_views):
        angle = 0.05 * v
        ca, sa = np.cos(angle), np.sin(angle)
        rot = np.array([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]], dtype=np.float32)
        t = np.array([0.3 * v, 0.1 * v, 0.0], dtype=np.float32)
        ext = np.eye(4, dtype=np.float32)
        ext[:3, :3] = rot
        ext[:3, 3] = t
        proj = np.zeros((2, 4, 4), dtype=np.float32)
        proj[0] = ext
        proj[1, :3, :3] = intr
        projs.append(proj)
    projs = np.stack(projs)  # [V, 2, 4, 4]
    projs = np.broadcast_to(projs, (batch,) + projs.shape).copy()
    return intr, projs
