"""Differentiable plane-sweep homography warping.

Numerics parity with the reference ``homo_warping``
(/root/reference/models/module.py:297-332):

  * proj = src_proj @ inv(ref_proj); rot = proj[:3,:3], trans = proj[:3,3]
  * for each depth hypothesis d(b, k[, y, x]):
        p = rot @ (x, y, 1)^T * d + trans;  (u, v) = (p.x/p.z, p.y/p.z)
  * normalized grid  gx = u / ((W-1)/2) - 1,  gy = v / ((H-1)/2) - 1
  * sampled with torch ``F.grid_sample(mode='bilinear',
    padding_mode='zeros')`` whose default ``align_corners=False``
    un-normalizes as  px = ((gx+1) * W - 1) / 2.

The grid computation is non-differentiated in the reference (wrapped in
``no_grad``); here gradients through the geometry are stopped with
``lax.stop_gradient`` so VJPs match.

Layout: features are NHWC ([B, H, W, C]); the warped result is
[B, D, H, W, C].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Camera-geometry matmuls must run at full fp32 precision: the default TPU
# matmul precision (bfloat16 passes) shifts sampling coordinates by ~1e-2 px,
# which is visible against the reference numerics.
_HIGHEST = jax.lax.Precision.HIGHEST


def _unnormalize(g: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (g + 1.0) * (size - 1) / 2.0
    return ((g + 1.0) * size - 1.0) / 2.0


def bilinear_sample_zeros(img: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample with zero padding (grid_sample 'zeros' semantics).

    img: [B, H, W, C]; px, py: [B, ...] pixel coordinates.
    Returns [B, ..., C]. Out-of-bounds corner taps contribute zero.
    """
    b, h, w, c = img.shape
    out_shape = px.shape[1:]
    px = px.reshape(b, -1)
    py = py.reshape(b, -1)

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    img_flat = img.reshape(b, h * w, c)

    def tap(xi, yi):
        valid = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        idx = yc * w + xc
        vals = jnp.take_along_axis(img_flat, idx[..., None], axis=1)
        return vals * valid[..., None].astype(img.dtype)

    va = tap(x0i, y0i)
    vb = tap(x0i + 1, y0i)
    vc = tap(x0i, y0i + 1)
    vd = tap(x0i + 1, y0i + 1)
    wx = wx[..., None].astype(img.dtype)
    wy = wy[..., None].astype(img.dtype)
    out = (va * (1 - wx) * (1 - wy) + vb * wx * (1 - wy)
           + vc * (1 - wx) * wy + vd * wx * wy)
    return out.reshape((b,) + out_shape + (c,))


def plane_sweep_grid(src_proj: jnp.ndarray, ref_proj: jnp.ndarray,
                     depth_values: jnp.ndarray, height: int, width: int,
                     align_corners: bool = False):
    """Pixel-space sampling coordinates for the plane sweep.

    src_proj, ref_proj: [B, 4, 4] fused K·[R|t] matrices.
    depth_values: [B, D] or [B, D, H, W].
    Returns (px, py): [B, D, H, W] source-image pixel coordinates.
    """
    b = src_proj.shape[0]
    d = depth_values.shape[1]
    proj = jnp.matmul(src_proj, jnp.linalg.inv(ref_proj), precision=_HIGHEST)
    rot = proj[:, :3, :3]
    trans = proj[:, :3, 3]

    y, x = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    xyz = jnp.stack([x.ravel(), y.ravel(), jnp.ones_like(x).ravel()])  # [3, HW]
    rot_xyz = jnp.matmul(rot, xyz[None], precision=_HIGHEST)  # [B, 3, HW]
    depth = depth_values.reshape(b, 1, d, -1)  # [B,1,D,1] or [B,1,D,HW]
    rot_depth_xyz = rot_xyz[:, :, None, :] * depth  # [B, 3, D, HW]
    proj_xyz = rot_depth_xyz + trans[:, :, None, None]
    z = proj_xyz[:, 2]
    u = proj_xyz[:, 0] / z
    v = proj_xyz[:, 1] / z
    gx = u / ((width - 1) / 2.0) - 1.0
    gy = v / ((height - 1) / 2.0) - 1.0
    px = _unnormalize(gx, width, align_corners).reshape(b, d, height, width)
    py = _unnormalize(gy, height, align_corners).reshape(b, d, height, width)
    return px, py


def pallas_sampler_supported(src_fea: jnp.ndarray, backend: str | None = None) -> bool:
    """Whether the banded Pallas sampler can handle this call on this
    backend. It is inference-only (no VJP) — callers pick it for eval."""
    _, h, _, c = src_fea.shape
    if backend is None:
        backend = jax.default_backend()
    return (backend == "tpu" and 128 % c == 0 and h % 8 == 0
            and src_fea.dtype in (jnp.float32, jnp.bfloat16))


def plane_sweep_warp(src_fea: jnp.ndarray, src_proj: jnp.ndarray,
                     ref_proj: jnp.ndarray, depth_values: jnp.ndarray,
                     align_corners: bool = False,
                     sampler: str = "xla",
                     sampler_opts: dict | None = None,
                     return_overflow: bool = False):
    """Warp source features over depth hypotheses into the reference frustum.

    src_fea: [B, H, W, C]; src_proj/ref_proj: [B, 4, 4] fused matrices;
    depth_values: [B, D] or [B, D, H, W]. Returns [B, D, H, W, C]; with
    ``return_overflow`` returns (warped, overflow [1,1] i32) — nonzero means
    the banded sampler dropped out-of-window taps (always 0 on the XLA path).

    sampler: "xla" (gather-based, differentiable) or "pallas" (banded
    one-hot-matmul TPU kernel, inference-only — see ops/pallas/sweep_sampler).
    sampler_opts: kwargs forwarded to the pallas sampler (wb, band_rows,
    lookahead, interpret).
    """
    if sampler == "pallas":
        from .pallas.sweep_sampler import plane_sweep_warp_pallas
        # drop opts only the FUSED cost-volume kernel understands (callers
        # share one sampler_opts dict across both kernels)
        opts = {k: v for k, v in (sampler_opts or {}).items()
                if k not in ("depth_group", "two_tier", "narrow_wb",
                             "narrow_band_rows", "x_subtiles", "sub_wb")}
        return plane_sweep_warp_pallas(src_fea, src_proj, ref_proj,
                                       depth_values, align_corners,
                                       return_overflow=return_overflow,
                                       **opts)
    _, h, w, _ = src_fea.shape
    px, py = plane_sweep_grid(src_proj, ref_proj, depth_values, h, w, align_corners)
    px = jax.lax.stop_gradient(px)
    py = jax.lax.stop_gradient(py)
    out = bilinear_sample_zeros(src_fea, px, py)
    if return_overflow:
        return out, jnp.zeros((1, 1), jnp.int32)
    return out
