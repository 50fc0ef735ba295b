"""Sequence-parallel linear attention for FMT at high resolution.

The reference has no sequence parallelism (SURVEY §2.7); the TPU-native
plan (SURVEY §5) observes that FMT's kernelized linear attention
(models/FMT.py:16-37) has a per-head d x d KV summary, so "ring attention"
degenerates to a single psum: shard the (h*w) token axis across the mesh,
compute partial KV = sum_s K_s V_s^T and K_sum locally, all-reduce both
(2 * H * D * D floats — tiny, rides ICI), then finish locally. Exact —
not an approximation — because the attention kernel is linear in the
key/value sum.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def _feature_map(x):
    return jax.nn.elu(x) + 1.0


def sequence_parallel_linear_attention(q, k, v, mesh: Mesh,
                                       axis: str = "space",
                                       eps: float = 1e-6):
    """q, k, v: [B, L, H, D] with L divisible by mesh.shape[axis].

    Returns [B, L, H, D], numerically identical to the unsharded
    nn.fmt.linear_attention (up to reduction order).
    """

    def local(q, k, v):
        qf = _feature_map(q)
        kf = _feature_map(k)
        kv_partial = jnp.einsum("nshd,nshm->nhmd", kf, v)
        ksum_partial = kf.sum(axis=1)
        kv = jax.lax.psum(kv_partial, axis)
        ksum = jax.lax.psum(ksum_partial, axis)
        z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", qf, ksum) + eps)
        return jnp.einsum("nlhd,nhmd,nlh->nlhm", qf, kv, z)

    spec = P(None, axis, None, None)
    return shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec)(q, k, v)
