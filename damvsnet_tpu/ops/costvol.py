"""Cost-volume construction: plane-sweep warp + multi-view aggregation.

Two aggregation modes, parity with DepthNet.forward
(/root/reference/models/cas_mvsnet.py:29-91):

  * "variance":  Var over views of {ref, warped srcs}:
        E[f^2] - E[f]^2 over the N volumes (ref replicated across D).
  * "adaptive":  per-source-view visibility weighting (Uni-MVSNet style):
        diff_v = (ref - warp_v)^2
        w_v    = weight_fn(diff_v)                  (AggWeightNetVolume)
        agg    = sum_v (w_v + 1) * diff_v / (N - 1)

The view loop is unrolled in Python (N is small and static); each iteration
fuses warp + squared-diff + weighting + accumulate so XLA never materializes
more than one warped volume — the memory behavior the reference approximates
with in-place ops (cas_mvsnet.py:52-59).

Layout: features NHWC; volumes [B, D, H, W, C].
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp

from .warp import pallas_sampler_supported, plane_sweep_warp


def build_cost_volume(
    ref_fea: jnp.ndarray,
    src_feas: Sequence[jnp.ndarray],
    ref_proj: jnp.ndarray,
    src_projs: Sequence[jnp.ndarray],
    depth_values: jnp.ndarray,
    mode: str = "adaptive",
    weight_fn: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    align_corners: bool = False,
    sampler: str = "xla",
    sampler_opts: dict | None = None,
    return_overflow: bool = False,
):
    """ref_fea [B,H,W,C]; src_feas: list of [B,H,W,C]; projs fused [B,4,4];
    depth_values [B,D] or [B,D,H,W]. Returns [B,D,H,W,C]; with
    ``return_overflow``, (volume, overflow [1,1] i32) — the OR over all
    source views of the banded sampler's dropped-taps flag (0 on XLA path).

    sampler: "xla" | "pallas" | "auto" — "auto" picks the banded Pallas TPU
    sampler when supported (it is inference-only; training passes "xla").
    """
    assert mode in ("variance", "adaptive"), mode
    if sampler == "auto":
        sampler = "pallas" if pallas_sampler_supported(ref_fea) else "xla"
    num_views = len(src_feas) + 1
    ref_volume = ref_fea[:, None]  # [B,1,H,W,C], broadcasts over D
    overflow = jnp.zeros((1, 1), jnp.int32)

    def warp(src_fea, src_proj):
        return plane_sweep_warp(src_fea, src_proj, ref_proj, depth_values,
                                align_corners, sampler=sampler,
                                sampler_opts=sampler_opts,
                                return_overflow=True)

    if mode == "variance":
        vol_sum = None
        vol_sq_sum = None
        for src_fea, src_proj in zip(src_feas, src_projs):
            warped, of = warp(src_fea, src_proj)
            overflow = overflow | of
            if vol_sum is None:
                ref_b = jnp.broadcast_to(ref_volume, warped.shape)
                vol_sum = ref_b + warped
                vol_sq_sum = ref_b ** 2 + warped ** 2
            else:
                vol_sum = vol_sum + warped
                vol_sq_sum = vol_sq_sum + warped ** 2
        out = vol_sq_sum / num_views - (vol_sum / num_views) ** 2
        return (out, overflow) if return_overflow else out

    assert weight_fn is not None, "adaptive mode needs the AggWeightNet apply fn"
    vol_adapt = None
    for src_fea, src_proj in zip(src_feas, src_projs):
        warped, of = warp(src_fea, src_proj)
        overflow = overflow | of
        diff_sq = (ref_volume - warped) ** 2  # [B,D,H,W,C]
        weight = weight_fn(diff_sq)  # [B,D,H,W,1]
        contrib = (weight + 1.0) * diff_sq
        vol_adapt = contrib if vol_adapt is None else vol_adapt + contrib
    out = vol_adapt / (num_views - 1)
    return (out, overflow) if return_overflow else out
