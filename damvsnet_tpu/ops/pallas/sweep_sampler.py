"""Pallas TPU kernel: banded one-hot-matmul plane-sweep bilinear sampler.

Replaces the XLA gather in ``ops.warp.plane_sweep_warp`` — on TPU the
gather lowering is per-index-overhead-bound (~10 ns/index, PERF.md), so a
stage-1 warp spends ~40 ms in 4 taps x 4M indices while the same traffic
streamed would take ~0.5 ms. This kernel keeps everything dense.

Grid cell = (b, d, NY=8 output rows, 128-px x-block). Per cell:
  1. recompute sampling coordinates px/py per row from the fused
     homography P = src_proj @ inv(ref_proj) (a dozen VPU FMAs per lane —
     cheaper than streaming precomputed [D,H,W] grids from HBM);
  2. ONE band DMA covering all NY rows' sampling windows: source rows
     [ybase_c, ybase_c+JP), cols [xbase_c, xbase_c+WBP). The source is
     pre-packed as [B, WP, HP*C] so the band lands in VMEM directly in
     the [WBP, JP*C] layout the matmul consumes — no transposes;
  3. per output row: slice the row's tighter [WB, J*C] sub-band (offsets
     kept 8/128-aligned), resolve the two x-taps of the bilinear kernel
     with ONE MXU matmul against a hat-function weight matrix
     WX^T [WB, XBLK] (max(0, 1-|px-o|) == the bilinear x-weights), then
     resolve the two y-taps with a J-step masked reduction on the VPU.

NY=8 rows per cell amortizes the ~1 us/grid-step fixed cost (measured:
at 1 row/cell that overhead was ~70% of runtime). The band DMA for cell
i+L-1 is started at cell i (the lookahead depth-block comes in via a
second, shifted BlockSpec on the same depth array), so DMA overlaps
compute.

Numerics parity: matches ``bilinear_sample_zeros`` / ``plane_sweep_grid``
(reference torch ``homo_warping`` + ``F.grid_sample(align_corners=False,
padding_mode='zeros')``, /root/reference/models/module.py:297-332):
per-tap zero padding, (d-1)/2 grid normalization, f32 geometry (the
one-hot matmul runs at HIGHEST precision for f32 inputs). Non-finite
projections (z<=0 blowups) sample to zero.

Band-coverage contract: per output row the in-image taps must fit a
(WB, J) window, and the 8 rows' windows must fit the (WBP, JP) cell
band. Measured spreads at DTU/TnT eval geometry are <=140 px in x per
128-lane block and <=12 rows in y (PERF.md), so the defaults hold with
margin; the kernel returns an overflow flag (OR over all cells) so
callers / tests can verify a configuration. On overflow, out-of-window
taps are dropped (never misread).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HIGHEST = jax.lax.Precision.HIGHEST

NY = 8  # output rows per grid cell (stage heights are multiples of 8)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _affine(size: int, align_corners: bool):
    """px = u * sx + ox mapping from projected coords to grid_sample pixels."""
    if align_corners:
        return 1.0, 0.0
    return size / (size - 1.0), -0.5


def _decompose(pid, d, nyb, nxb):
    xb = pid % nxb
    t = pid // nxb
    yb = t % nyb
    t = t // nyb
    di = t % d
    b = t // d
    return b, di, yb, xb


def _kernel(dv_ref, dvn_ref, geom_ref, src_ref, out_ref, of_ref,
            band, sem, carry,
            *, H, W, HP, WP, C, D, XBLK, WB, J, WBP, JP, NYB, NXB, L,
            sx, ox, sy, oy, out_dtype):
    pid = pl.program_id(0)
    ncells = pl.num_programs(0)
    AY = 128 // C  # y-base alignment keeping lane offsets 128-aligned
    jc = J * C

    def pxpy_of(dv, b, y, xb):
        """Sampling coords for one row; dv [1, XBLK] f32 -> (1, XBLK) x2."""
        xf = jax.lax.broadcasted_iota(jnp.int32, (1, XBLK), 1).astype(
            jnp.float32) + (xb.astype(jnp.float32) * XBLK)
        yf = y.astype(jnp.float32)
        g = lambda k: geom_ref[b, k]
        nx = (g(0) * xf + (g(1) * yf + g(2))) * dv + g(9)
        ny = (g(3) * xf + (g(4) * yf + g(5))) * dv + g(10)
        z = (g(6) * xf + (g(7) * yf + g(8))) * dv + g(11)
        px = nx / z * sx + ox
        py = ny / z * sy + oy
        return px, py

    def row_span(px, py, xb):
        """Int32 scalars (ymin, xmin, ytop, xtop): the in-image tap span.
        The lane mask uses the GLOBAL pixel x (not the local lane index):
        when W % XBLK != 0 the padding lanes carry zero depth values and
        project to arbitrary finite points that would otherwise widen the
        span (or flag overflow) spuriously."""
        lane_ok = (jax.lax.broadcasted_iota(jnp.int32, (1, XBLK), 1)
                   + xb * XBLK) < W
        semi = (jnp.isfinite(px) & jnp.isfinite(py)
                & (px > -1.0) & (px < W) & (py > -1.0) & (py < H) & lane_ok)
        big = jnp.float32(1e9)
        xmin = jnp.clip(jnp.min(jnp.where(semi, px, big)), -1.0, W * 1.0)
        ymin = jnp.clip(jnp.min(jnp.where(semi, py, big)), -1.0, H * 1.0)
        xmax = jnp.clip(jnp.max(jnp.where(semi, px, -big)), -1.0, W * 1.0)
        ymax = jnp.clip(jnp.max(jnp.where(semi, py, -big)), -1.0, H * 1.0)
        return (jnp.floor(ymin).astype(jnp.int32),
                jnp.floor(xmin).astype(jnp.int32),
                jnp.minimum(jnp.floor(ymax).astype(jnp.int32) + 1, H - 1),
                jnp.minimum(jnp.floor(xmax).astype(jnp.int32) + 1, W - 1))

    def stage_cell(cell, slot, dv2d):
        """Compute cell+row windows, persist bases to SMEM, start band DMA.

        dv2d: the cell's depth block [NY, XBLK] f32.
        """
        b, di, yb, xb = _decompose(cell, D, NYB, NXB)
        spans = []
        for r in range(NY):
            px, py = pxpy_of(dv2d[r:r + 1], b, yb * NY + r, xb)
            spans.append(row_span(px, py, xb))
        ymin_c = spans[0][0]
        xmin_c = spans[0][1]
        for r in range(1, NY):
            ymin_c = jnp.minimum(ymin_c, spans[r][0])
            xmin_c = jnp.minimum(xmin_c, spans[r][1])
        ybase_c = jnp.clip(ymin_c, 0, HP - JP) // AY * AY
        xbase_c = jnp.clip(xmin_c, 0, WP - WBP) // 8 * 8
        of = jnp.int32(0)
        for r in range(NY):
            ymin, xmin, ytop, xtop = spans[r]
            ybase_r = jnp.clip(jnp.clip(ymin, 0, HP - J) // AY * AY,
                               ybase_c, ybase_c + (JP - J))
            xbase_r = jnp.clip(jnp.clip(xmin, 0, WP - WB) // 8 * 8,
                               xbase_c, xbase_c + (WBP - WB))
            of = of | ((xtop - xbase_r > WB - 1)
                       | (ytop - ybase_r > J - 1)).astype(jnp.int32)
            carry[slot, 2 * r] = ybase_r - ybase_c
            carry[slot, 2 * r + 1] = xbase_r - xbase_c
        carry[slot, 2 * NY] = ybase_c
        carry[slot, 2 * NY + 1] = xbase_c
        carry[slot, 2 * NY + 2] = of
        pltpu.make_async_copy(
            src_ref.at[b, pl.ds(pl.multiple_of(xbase_c, 8), WBP),
                       pl.ds(pl.multiple_of(ybase_c * C, 128), JP * C)],
            band.at[slot], sem.at[slot]).start()

    # warm-up: the first L-1 cells stage their own band on arrival
    @pl.when(pid < L - 1)
    def _():
        stage_cell(pid, pid % L, dv_ref[0, 0])

    # steady state: stage the band L-1 cells ahead
    @pl.when(pid + L - 1 < ncells)
    def _():
        ahead = pid + L - 1
        stage_cell(ahead, ahead % L, dvn_ref[0, 0])

    cur = pid % L
    b, di, yb, xb = _decompose(pid, D, NYB, NXB)
    ybase_c = carry[cur, 2 * NY]
    xbase_c = carry[cur, 2 * NY + 1]

    @pl.when(pid == 0)
    def _():
        of_ref[0, 0] = jnp.int32(0)

    of_ref[0, 0] = of_ref[0, 0] | carry[cur, 2 * NY + 2]

    pltpu.make_async_copy(
        src_ref.at[b, pl.ds(pl.multiple_of(xbase_c, 8), WBP),
                   pl.ds(pl.multiple_of(ybase_c * C, 128), JP * C)],
        band.at[cur], sem.at[cur]).wait()

    mm_prec = (_HIGHEST if band.dtype == jnp.float32
               else jax.lax.Precision.DEFAULT)
    # loop-invariant index plane
    o_iota = jax.lax.broadcasted_iota(jnp.int32, (WB, XBLK), 0)

    for r in range(NY):
        px, py = pxpy_of(dv_ref[0, 0, r:r + 1], b, yb * NY + r, xb)
        yoff = carry[cur, 2 * r]
        xoff = carry[cur, 2 * r + 1]
        ybase_r = ybase_c + yoff
        xbase_r = xbase_c + xoff
        sub = band[cur, pl.ds(pl.multiple_of(xoff, 8), WB),
                   pl.ds(pl.multiple_of(yoff * C, 128), jc)]

        # x-resolve: hat-function weights max(0, 1-|px-o|) == bilinear
        # x-weights with per-tap zero padding (o>=W masked; px<-1 or
        # non-finite carry the -2 sentinel => hat is 0 there)
        fin = jnp.isfinite(px) & jnp.isfinite(py)
        pxc = jnp.where(fin, jnp.clip(px, -2.0, W + 1.0), -2.0)
        o_ids = o_iota + xbase_r
        wxt = jnp.maximum(0.0, 1.0 - jnp.abs(pxc - o_ids.astype(jnp.float32)))
        wxt = jnp.where(o_ids <= W - 1, wxt, 0.0)  # [WB, XBLK]
        # output pixels land on LANES: [J*C, XBLK] so the result tile is
        # [C, XBLK] and the kernel output stays (H*C, W)-shaped — a dense,
        # unpadded layout (a [.., W, C] output would pad C to 128 lanes)
        acc = jax.lax.dot_general(
            sub, wxt.astype(band.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mm_prec)  # [J*C, XBLK]

        # y-resolve: hat weights over the J band rows (masked reduction)
        pyc = jnp.where(fin, jnp.clip(py, -2.0, H + 1.0), -2.0)
        out = jnp.zeros((C, XBLK), jnp.float32)
        for j in range(J):
            row = ybase_r + j
            m = jnp.maximum(
                0.0, 1.0 - jnp.abs(pyc - row.astype(jnp.float32)))
            m = jnp.where(row <= H - 1, m, 0.0)  # (1, XBLK)
            out = out + m * acc[j * C:(j + 1) * C, :]
        out_ref[0, 0, r * C:(r + 1) * C] = out.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("wb", "band_rows", "xblk", "align_corners", "lookahead",
                     "interpret"))
def sample_bilinear_band(src_fea: jnp.ndarray, geom: jnp.ndarray,
                         depth_values: jnp.ndarray, *,
                         wb: int = 192, band_rows: int = 16, xblk: int = 128,
                         align_corners: bool = False, lookahead: int = 2,
                         packed: bool = False,
                         interpret: bool = False):
    """Banded plane-sweep bilinear sampling.

    src_fea [B, H, W, C]; geom [B, 12] f32 — rows of P = src@inv(ref):
    (r00,r01,r02, r10,r11,r12, r20,r21,r22, t0,t1,t2);
    depth_values [B, D, H, W] f32 (per-pixel hypotheses; broadcast upstream).
    Returns (warped [B, D, H, W, C] in src dtype, overflow [1, 1] i32 — the
    OR over all cells; nonzero means some cell's window did not cover its
    in-image taps and contributions were dropped).

    ``packed=True`` skips the unpack and returns the kernel's native dense
    [B, D, H*C, W] layout where row y*C+ci holds channel ci of output row y
    (the layout a fused consumer should read — it avoids both the unpack
    transpose and padding C up to 128 lanes).

    Requires H % 8 == 0 and 128 % C == 0 (reference stage shapes satisfy
    both); otherwise use the XLA path.
    """
    b, h, w, c = src_fea.shape
    d = depth_values.shape[1]
    if 128 % c:
        raise ValueError(f"channel count {c} must divide 128 for the "
                         "banded sampler; use the XLA path instead")
    if h % NY:
        raise ValueError(f"height {h} must be a multiple of {NY} for the "
                         "banded sampler; use the XLA path instead")
    ay = 128 // c
    xblk = xblk if w >= xblk else w  # small images: one block spans the row
    # wb/band_rows are USABLE spread budgets: window bases are quantized
    # down to 8-px / AY-row alignment, so the physical window must carry
    # that slack on top (at C=8 the y alignment alone is 16 rows)
    wb = min(_round_up(wb + 7, 8), _round_up(w, 8))
    j = min(_round_up(band_rows + ay - 1, ay), _round_up(h, ay))
    # cell-level band: per-row windows drift across the NY rows
    wbp = wb + 32
    jp = j + _round_up(NY + ay, ay)
    nxb = pl.cdiv(w, xblk)
    nyb = h // NY
    ncells = b * d * nyb * nxb
    sx, ox = _affine(w, align_corners)
    sy, oy = _affine(h, align_corners)

    # pack source as [B, WP, HP*C]: the band DMA lands in VMEM already in
    # the [WBP, JP*C] layout the matmul consumes; pad so aligned bases
    # still cover the image's top/right edges (pad samples are zero-weight)
    hp = max(_round_up(h, ay) + ay, jp)
    wp = max(_round_up(w, 8) + 8, wbp)
    src_packed = jnp.zeros((b, wp, hp * c), src_fea.dtype)
    src_packed = jax.lax.dynamic_update_slice(
        src_packed,
        jnp.transpose(src_fea, (0, 2, 1, 3)).reshape(b, w, h * c),
        (0, 0, 0))
    dvals = depth_values.astype(jnp.float32)

    lkh = max(2, min(lookahead, ncells))
    kern = functools.partial(
        _kernel, H=h, W=w, HP=hp, WP=wp, C=c, D=d, XBLK=xblk, WB=wb, J=j,
        WBP=wbp, JP=jp, NYB=nyb, NXB=nxb, L=lkh,
        sx=sx, ox=ox, sy=sy, oy=oy, out_dtype=src_fea.dtype)

    def cell_idx(i):
        return _decompose(i, d, nyb, nxb)

    def dv_idx(i):
        return cell_idx(i)

    def dv_next_idx(i):
        return cell_idx(jnp.minimum(i + lkh - 1, ncells - 1))

    warped, overflow = pl.pallas_call(
        kern,
        grid=(ncells,),
        in_specs=[
            pl.BlockSpec((1, 1, NY, xblk), dv_idx),
            pl.BlockSpec((1, 1, NY, xblk), dv_next_idx),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=(
            # packed (H*C, W): block rows yb*NY*C .. (yb+1)*NY*C-1 hold the
            # cell's NY output rows, C channel-rows each — the kernel's
            # native [C, XBLK] tiles land here without lane padding
            pl.BlockSpec((1, 1, NY * c, xblk), cell_idx),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, d, h * c, w), src_fea.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((lkh, wbp, jp * c), src_fea.dtype),
            pltpu.SemaphoreType.DMA((lkh,)),
            pltpu.SMEM((lkh, 2 * NY + 3), jnp.int32),
        ],
        interpret=interpret,
    )(dvals, dvals, geom, src_packed)
    if not packed:
        warped = jnp.moveaxis(warped.reshape(b, d, h, c, w), 3, 4)
    return warped, overflow


def geom_from_projs(src_proj: jnp.ndarray, ref_proj: jnp.ndarray) -> jnp.ndarray:
    """[B, 12] fused-homography rows for sample_bilinear_band (f32, HIGHEST)."""
    proj = jnp.matmul(src_proj.astype(jnp.float32),
                      jnp.linalg.inv(ref_proj.astype(jnp.float32)),
                      precision=_HIGHEST)
    return jnp.concatenate(
        [proj[:, :3, :3].reshape(-1, 9), proj[:, :3, 3]], axis=1)


def plane_sweep_warp_pallas(src_fea: jnp.ndarray, src_proj: jnp.ndarray,
                            ref_proj: jnp.ndarray, depth_values: jnp.ndarray,
                            align_corners: bool = False,
                            wb: int = 192, band_rows: int = 16,
                            lookahead: int = 2,
                            interpret: bool = False,
                            return_overflow: bool = False):
    """Drop-in for ops.warp.plane_sweep_warp (inference path; non-diff)."""
    b, h, w, _ = src_fea.shape
    if depth_values.ndim == 2:
        depth_values = jnp.broadcast_to(
            depth_values[:, :, None, None], depth_values.shape + (h, w))
    geom = geom_from_projs(src_proj, ref_proj)
    warped, overflow = sample_bilinear_band(
        src_fea, geom, depth_values, wb=wb, band_rows=band_rows,
        lookahead=lookahead, align_corners=align_corners, interpret=interpret)
    if return_overflow:
        return warped, overflow
    return warped
