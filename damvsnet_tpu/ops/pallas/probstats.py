"""Fused probability-volume statistics kernel.

One VMEM pass over the [D, N] regularized cost volume computes softmax,
soft-argmin depth, the 4-tap-window photometric confidence and the 3-sigma
uncertainty band (the XLA path needs softmax + 4 reductions + a pad/cumsum
+ a gather — several HBM round trips).

The windowed-confidence gather is re-expressed as a masked reduction:
sum4[idx] == sum_d p[d] * 1[idx-1 <= d <= idx+2], so no per-column gather
is needed — pure VPU ops.

Inference-only (the stats tail is under stop_gradient in the reference,
cas_mvsnet.py:113-118; depth/sigma gradients flow through the XLA path
during training).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(cost_ref, dv_ref, prob_ref, depth_ref, conf_ref, sigma_ref):
    cost = cost_ref[:]  # [D, TN]
    dv = dv_ref[:]
    d = cost.shape[0]

    m = jnp.max(cost, axis=0, keepdims=True)
    p = jnp.exp(cost - m)
    s = jnp.sum(p, axis=0, keepdims=True)
    prob = p / s
    prob_ref[:] = prob

    depth = jnp.sum(prob * dv, axis=0, keepdims=True)  # [1, TN]
    depth_ref[:] = depth

    # Mosaic only lowers integer iota (f32 iota verifies in interpret mode
    # but fails 'tpu.iota' verification on hardware) — iota i32, then cast.
    d_iota = jax.lax.broadcasted_iota(
        jnp.int32, cost.shape, 0).astype(jnp.float32)
    idx_f = jnp.sum(prob * d_iota, axis=0, keepdims=True)
    idx = jnp.clip(idx_f.astype(jnp.int32), 0, d - 1).astype(jnp.float32)
    window = ((d_iota >= idx - 1.0) & (d_iota <= idx + 2.0)).astype(prob.dtype)
    conf_ref[:] = jnp.sum(prob * window, axis=0, keepdims=True)

    var = jnp.sum(prob * (dv - depth) ** 2, axis=0, keepdims=True)
    sigma_ref[:] = 3.0 * jnp.sqrt(var)


@functools.partial(jax.jit, static_argnames=("interpret",))
def prob_volume_stats_pallas(prob_volume_pre: jnp.ndarray,
                             depth_values: jnp.ndarray,
                             interpret: bool = False):
    """prob_volume_pre [B, D, H, W]; depth_values [B, D] or [B, D, H, W].
    Returns the same dict as ops.regression.prob_volume_stats."""
    b, d, h, w = prob_volume_pre.shape
    n = b * h * w
    cost = jnp.moveaxis(prob_volume_pre, 1, 0).reshape(d, n)
    if depth_values.ndim == 2:
        dv = jnp.broadcast_to(depth_values.T[:, :, None, None], (d, b, h, w))
    else:
        dv = jnp.moveaxis(depth_values, 1, 0)
    dv = dv.reshape(d, n)

    tile = 512
    pad = (-n) % tile
    if pad:
        cost = jnp.pad(cost, ((0, 0), (0, pad)))
        dv = jnp.pad(dv, ((0, 0), (0, pad)), constant_values=1.0)
    nt = cost.shape[1] // tile

    grid_spec = pl.GridSpec(
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((d, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((d, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
    )
    prob, depth, conf, sigma = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(cost.shape, cost.dtype),
            jax.ShapeDtypeStruct((1, cost.shape[1]), cost.dtype),
            jax.ShapeDtypeStruct((1, cost.shape[1]), cost.dtype),
            jax.ShapeDtypeStruct((1, cost.shape[1]), cost.dtype),
        ],
        interpret=interpret,
    )(cost, dv)

    def unflat(x, with_d=False):
        x = x[:, :n]
        if with_d:
            return jnp.moveaxis(x.reshape(d, b, h, w), 0, 1)
        return x.reshape(b, h, w)

    return {
        "depth": unflat(depth),
        "photometric_confidence": unflat(conf),
        "variance": unflat(sigma),
        "prob_volume": unflat(prob, with_d=True),
    }
