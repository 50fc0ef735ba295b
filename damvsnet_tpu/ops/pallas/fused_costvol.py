"""Pallas TPU kernel: fused adaptive cost-volume construction.

Extends the banded plane-sweep sampler (sweep_sampler.py) to produce the
*aggregated* adaptive cost volume directly:

    agg = sum_v (w_v + 1) * (ref - warp_v)^2 / (N - 1)
    w_v = relu(w2 * relu(diff2 @ w1 + b1) + b2)      (BN-folded AggWeightNet)

The source-view index v is the innermost grid dimension, so each cell's
accumulator tile stays in VMEM across all V views and only the final
aggregate is written to HBM. The per-view warped volumes the XLA path
materializes ([B, D, H, W, C] each — 0.5 GB/view at DTU stage 1) never
exist; per-view HBM traffic drops to the banded source reads.

Depth-group batching (the r3 speedup): each grid step processes G depth
hypotheses (default 16, r4 sweep) against ONE shared band DMA and one window
computation, and the per-row bilinear x-resolve becomes a single wide
matmul [WB, J*C]^T x [WB, G*XBLK] instead of G narrow ones. This is
sound because the projected coordinate px(d) = (a*d + b) / (c*d + e) is
a Moebius function of the hypothesis depth — monotone in d wherever the
denominator z keeps its sign — so the union of the G depths' tap spans
is the hull of the spans at the group's per-pixel min and max depth
(computed in-kernel, so hypotheses need NOT be sorted along D). z is
affine in d, so equal signs at dmin/dmax certify no pole inside the
hull; a sign change (a hypothesis crossing the source camera plane —
degenerate rig) raises the overflow flag and callers fall back to XLA.
Measured on a v5e at DTU eval geometry, grouping took the three stages
from 127/166/128 ms to well under half (per-step fixed costs — window
math, DMA issue, small-matmul latency — dominated at G=1), and the r4
sweep (scripts/tune_costvol.py) picked G=16 / band_rows=8 for another
~1.8x on stages 1/2 (PERF.md).

The AggWeightNet (two 1x1x1 conv+BN+relu stages, C->1->1,
/root/reference/models/module.py:544-563) collapses at inference into the
w1/b1/w2/b2 affine form above (BN running stats folded into the conv
weights — see nn.aggweight.fold_aggweight), so the "network" is a C-tap
dot product plus two scalar affines per voxel: pure VPU work on the tile.

Numerics: warp parity with sweep_sampler (reference homo_warping +
grid_sample(zeros), module.py:297-332); aggregation parity with
ops.costvol.build_cost_volume(mode="adaptive")
(/root/reference/models/cas_mvsnet.py:64-87). diff^2/weight/accumulate in
f32 regardless of feature dtype (matches the XLA path's f32 weight net).
Inference-only (no VJP) — training uses the XLA path.

Band-coverage contract, overflow flag, and window-budget semantics are
identical to sweep_sampler: wb/band_rows are usable spread budgets (the
group's extra disparity drift counts against wb), the flag reports
dropped taps, callers fall back to XLA on overflow.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sweep_sampler import NY, _affine, _round_up, geom_from_projs

_HIGHEST = jax.lax.Precision.HIGHEST


def _kernel(dv_ref, dvn_ref, geom_ref, scal_ref, ofmap_in_ref, src_ref,
            ref_ref, w1_ref,
            out_ref, of_ref, ofmap_out_ref,
            band, sem, carry, acc,
            *, H, W, HP, WP, C, DG, G, V, XBLK, WB, J, WBP, JP, NYB, NXB, L,
            sx, ox, sy, oy, out_dtype, OFM, XS, SWB):
    """OFM (static) selects the two-tier role of this pass:
      0 — single-pass (classic): global overflow scalar only.
      1 — narrow pass: additionally write a PER-CELL overflow map
          (cell = one (b, depth-group, row-block, col-block) output tile,
          OR-reduced over its V view steps and NY rows).
      2 — wide repair pass: read the narrow pass's map and fully skip
          (window math, band DMA, matmuls, output write) every clean
          cell — only flagged cells pay the wide-window FLOPs. The
          global overflow scalar then reports RESIDUAL overflow at the
          wide windows (callers fall back to XLA only for that).

    XS (static) x-subtiles per 128-lane step: each output row is resolved
    as XS independent lane-halves with their own x-window of width SWB
    (< WB: a half's tap span is roughly half the tile-span term plus the
    full disparity drift), so the x-resolve matmul K-dim — the dominant
    FLOP term — shrinks by ~SWB/WB at unchanged lane occupancy. The cell
    band DMA still covers the row hull (WBP budget from `wb`). Depth
    values are host-packed subtile-major (lane = s*G*xs + g*xs + u) so
    every half's lanes stay contiguous/128-aligned. XS=1, SWB=WB is the
    classic kernel."""
    pid = pl.program_id(0)
    nsteps = pl.num_programs(0)
    AY = 128 // C
    jc = J * C
    GX = G * XBLK
    xs = XBLK // XS
    gxs = G * xs
    CR = 1 + XS  # carry ints per row: y-offset + XS x-offsets

    def step_flag(step):
        # does this step's cell need computing? (always, except clean
        # cells in the wide repair pass)
        if OFM != 2:
            return None
        return ofmap_in_ref[step // V, 0] != 0

    def decomp(step):
        v = step % V
        t = step // V
        xb = t % NXB
        t = t // NXB
        yb = t % NYB
        t = t // NYB
        dg = t % DG
        b = t // DG
        return b, dg, yb, xb, v

    def pxpy_z(dv, b, v, y, x0, n, wide=False):
        """Projected coords for one output row over n lanes; dv [1, n] f32.
        x0: the global pixel x of lane 0 (int32 scalar). Span path
        (wide=False): n consecutive pixels x0..x0+n-1. Wide resolve
        (wide=True, n = G*XBLK): subtile-major hypothesis packing, lane
        s*G*xs + g*xs + u carries hypothesis g at pixel x0 + s*xs + u."""
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        if wide:
            xoff = (lane // gxs) * xs + jax.lax.rem(lane, xs)
        else:
            xoff = lane
        xf = xoff.astype(jnp.float32) + x0.astype(jnp.float32)
        yf = y.astype(jnp.float32)
        g = lambda k: geom_ref[v, b, k]
        nx = (g(0) * xf + (g(1) * yf + g(2))) * dv + g(9)
        ny = (g(3) * xf + (g(4) * yf + g(5))) * dv + g(10)
        z = (g(6) * xf + (g(7) * yf + g(8))) * dv + g(11)
        px = nx / z * sx + ox
        py = ny / z * sy + oy
        return px, py, z

    def group_row_span(b, v, y, xb, sub, dv_row):
        """Union tap span over one subtile's G hypotheses: hull of the
        spans at the per-lane min and max depth (px/py are Moebius in d,
        so monotone wherever z keeps its sign — the [dmin, dmax] hull
        covers every hypothesis regardless of their order), plus a
        z-sign-change flag (z is affine in d: same sign at dmin/dmax <=>
        no pole inside). dv_row [1, G*XBLK] subtile-major; `sub` is the
        subtile index (0 when XS == 1)."""
        seg = dv_row[:, sub * gxs:(sub + 1) * gxs]
        dvlo = seg[:, :xs]
        dvhi = seg[:, :xs]
        for gi in range(1, G):
            sl = seg[:, gi * xs:(gi + 1) * xs]
            dvlo = jnp.minimum(dvlo, sl)
            dvhi = jnp.maximum(dvhi, sl)
        x0 = xb * XBLK + sub * xs
        px0, py0, z0 = pxpy_z(dvlo, b, v, y, x0, xs)
        px1, py1, z1 = pxpy_z(dvhi, b, v, y, x0, xs)
        # global pixel x, NOT the local lane index: when W % XBLK != 0 the
        # padding lanes carry zero depth values, and on a rig whose
        # relative t_z is exactly 0 their z is exactly 0 — a local-lane
        # mask would let them raise a spurious zcross overflow
        lane_ok = (jax.lax.broadcasted_iota(jnp.int32, (1, xs), 1)
                   + x0) < W
        zcross = lane_ok & (z0 * z1 <= 0.0)
        fin = (jnp.isfinite(px0) & jnp.isfinite(py0)
               & jnp.isfinite(px1) & jnp.isfinite(py1))
        # widen the hull by ~8 f32 ulps at coordinate scale: interior
        # hypotheses are evaluated independently in f32 and may exceed the
        # endpoint hull by rounding; the pad keeps the overflow flag (and
        # the DMA'd band) strictly conservative at negligible cost
        eps = 1e-3
        pxlo = jnp.minimum(px0, px1) - eps
        pxhi = jnp.maximum(px0, px1) + eps
        pylo = jnp.minimum(py0, py1) - eps
        pyhi = jnp.maximum(py0, py1) + eps
        semi = (fin & ~zcross & (pxhi > -1.0) & (pxlo < W)
                & (pyhi > -1.0) & (pylo < H) & lane_ok)
        big = jnp.float32(1e9)
        xmin = jnp.clip(jnp.min(jnp.where(semi, pxlo, big)), -1.0, W * 1.0)
        ymin = jnp.clip(jnp.min(jnp.where(semi, pylo, big)), -1.0, H * 1.0)
        xmax = jnp.clip(jnp.max(jnp.where(semi, pxhi, -big)), -1.0, W * 1.0)
        ymax = jnp.clip(jnp.max(jnp.where(semi, pyhi, -big)), -1.0, H * 1.0)
        return (jnp.floor(ymin).astype(jnp.int32),
                jnp.floor(xmin).astype(jnp.int32),
                jnp.minimum(jnp.floor(ymax).astype(jnp.int32) + 1, H - 1),
                jnp.minimum(jnp.floor(xmax).astype(jnp.int32) + 1, W - 1),
                jnp.max(zcross.astype(jnp.int32)))

    def stage_step(step, slot, dv_blk):
        """Window math + band DMA for one (cell, view) step; dv_blk is the
        step's packed depth block [NY, G*XBLK] (subtile-major lanes)."""
        b, dg, yb, xb, v = decomp(step)
        spans = []  # [row][subtile] -> (ymin, xmin, ytop, xtop)
        of = jnp.int32(0)
        for r in range(NY):
            row = []
            for s in range(XS):
                sp = group_row_span(b, v, yb * NY + r, xb, s,
                                    dv_blk[r:r + 1])
                row.append(sp[:4])
                of = of | sp[4]
            spans.append(row)
        ymin_c = spans[0][0][0]
        xmin_c = spans[0][0][1]
        for r in range(NY):
            for s in range(XS):
                ymin_c = jnp.minimum(ymin_c, spans[r][s][0])
                xmin_c = jnp.minimum(xmin_c, spans[r][s][1])
        ybase_c = jnp.clip(ymin_c, 0, HP - JP) // AY * AY
        xbase_c = jnp.clip(xmin_c, 0, WP - WBP) // 8 * 8
        for r in range(NY):
            # one y-window per row (hull over subtiles), one x-window per
            # (row, subtile)
            ymin_r = spans[r][0][0]
            ytop_r = spans[r][0][2]
            for s in range(1, XS):
                ymin_r = jnp.minimum(ymin_r, spans[r][s][0])
                ytop_r = jnp.maximum(ytop_r, spans[r][s][2])
            ybase_r = jnp.clip(jnp.clip(ymin_r, 0, HP - J) // AY * AY,
                               ybase_c, ybase_c + (JP - J))
            of = of | (ytop_r - ybase_r > J - 1).astype(jnp.int32)
            carry[slot, CR * r] = ybase_r - ybase_c
            for s in range(XS):
                _, xmin, _, xtop = spans[r][s]
                xbase_rs = jnp.clip(jnp.clip(xmin, 0, WP - SWB) // 8 * 8,
                                    xbase_c, xbase_c + (WBP - SWB))
                of = of | (xtop - xbase_rs > SWB - 1).astype(jnp.int32)
                carry[slot, CR * r + 1 + s] = xbase_rs - xbase_c
        carry[slot, CR * NY] = ybase_c
        carry[slot, CR * NY + 1] = xbase_c
        carry[slot, CR * NY + 2] = of
        pltpu.make_async_copy(
            src_ref.at[v, b, pl.ds(pl.multiple_of(xbase_c, 8), WBP),
                       pl.ds(pl.multiple_of(ybase_c * C, 128), JP * C)],
            band.at[slot], sem.at[slot]).start()

    early_cond = pid < L - 1
    ahead = pid + L - 1
    ahead_cond = ahead < nsteps
    if OFM == 2:
        early_cond = early_cond & step_flag(pid)
        ahead_cond = ahead_cond & step_flag(jnp.minimum(ahead, nsteps - 1))

    @pl.when(early_cond)
    def _():
        stage_step(pid, pid % L, dv_ref[0, 0])

    @pl.when(ahead_cond)
    def _():
        stage_step(ahead, ahead % L, dvn_ref[0, 0])

    cur = pid % L
    b, dg, yb, xb, v = decomp(pid)

    @pl.when(pid == 0)
    def _():
        of_ref[0, 0] = jnp.int32(0)

    def compute_step():
        ybase_c = carry[cur, CR * NY]
        xbase_c = carry[cur, CR * NY + 1]
        of_ref[0, 0] = of_ref[0, 0] | carry[cur, CR * NY + 2]
        if OFM == 1:
            cof = carry[cur, CR * NY + 2]

            @pl.when(v == 0)
            def _():
                ofmap_out_ref[pid // V, 0] = cof

            @pl.when(v > 0)
            def _():
                ofmap_out_ref[pid // V, 0] = ofmap_out_ref[pid // V, 0] | cof

        pltpu.make_async_copy(
            src_ref.at[v, b, pl.ds(pl.multiple_of(xbase_c, 8), WBP),
                       pl.ds(pl.multiple_of(ybase_c * C, 128), JP * C)],
            band.at[cur], sem.at[cur]).wait()

        mm_prec = (_HIGHEST if band.dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT)
        o_iota = jax.lax.broadcasted_iota(jnp.int32, (SWB, gxs), 0)
        b1 = scal_ref[0]
        w2 = scal_ref[1]
        b2 = scal_ref[2]
        inv_nm1 = scal_ref[3]
        w1 = w1_ref[:]  # [C, 1] f32, broadcasts over lanes

        for r in range(NY):
            px, py, _ = pxpy_z(dv_ref[0, 0, r:r + 1], b, v, yb * NY + r,
                               xb * XBLK, GX, wide=True)
            yoff = carry[cur, CR * r]
            ybase_r = ybase_c + yoff
            fin = jnp.isfinite(px) & jnp.isfinite(py)
            pxc = jnp.where(fin, jnp.clip(px, -2.0, W + 1.0), -2.0)
            pyc = jnp.where(fin, jnp.clip(py, -2.0, H + 1.0), -2.0)
            ref_row = ref_ref[0, r * C:(r + 1) * C, :].astype(jnp.float32)

            for s in range(XS):
                xoff_s = carry[cur, CR * r + 1 + s]
                xbase_s = xbase_c + xoff_s
                sub = band[cur, pl.ds(pl.multiple_of(xoff_s, 8), SWB),
                           pl.ds(pl.multiple_of(yoff * C, 128), jc)]
                pxc_s = pxc[:, s * gxs:(s + 1) * gxs] if XS > 1 else pxc
                pyc_s = pyc[:, s * gxs:(s + 1) * gxs] if XS > 1 else pyc
                o_ids = o_iota + xbase_s
                wxt = jnp.maximum(
                    0.0, 1.0 - jnp.abs(pxc_s - o_ids.astype(jnp.float32)))
                wxt = jnp.where(o_ids <= W - 1, wxt, 0.0)  # [SWB, G*xs]
                warp_jc = jax.lax.dot_general(
                    sub, wxt.astype(band.dtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=mm_prec)  # [J*C, G*xs]

                warp = jnp.zeros((C, gxs), jnp.float32)
                for j in range(J):
                    row = ybase_r + j
                    m = jnp.maximum(
                        0.0, 1.0 - jnp.abs(pyc_s - row.astype(jnp.float32)))
                    m = jnp.where(row <= H - 1, m, 0.0)
                    warp = warp + m * warp_jc[j * C:(j + 1) * C, :]

                # adaptive aggregation on the subtile: diff^2, folded
                # weight net, (w+1)*diff^2 accumulated over views in the
                # f32 accumulator. ref is hypothesis-independent: one
                # [C, xs] tile repeated G times along lanes.
                ref_seg = (ref_row[:, s * xs:(s + 1) * xs] if XS > 1
                           else ref_row)
                ref_tile = jnp.concatenate([ref_seg] * G, axis=1)
                diff = ref_tile - warp
                diff2 = diff * diff
                sacc = jnp.sum(diff2 * w1, axis=0, keepdims=True)
                wgt = jnp.maximum(w2 * jnp.maximum(sacc + b1, 0.0) + b2,
                                  0.0)
                contrib = (wgt + 1.0) * diff2

                @pl.when(v == 0)
                def _(r=r, s=s, contrib=contrib):
                    acc[r * C:(r + 1) * C,
                        s * gxs:(s + 1) * gxs] = contrib

                @pl.when(v > 0)
                def _(r=r, s=s, contrib=contrib):
                    acc[r * C:(r + 1) * C, s * gxs:(s + 1) * gxs] = (
                        acc[r * C:(r + 1) * C, s * gxs:(s + 1) * gxs]
                        + contrib)

        @pl.when(v == V - 1)
        def _():
            for g in range(G):
                if XS == 1:
                    tile = acc[:, g * XBLK:(g + 1) * XBLK]
                else:
                    # undo the subtile-major lane packing: pixel s*xs + u
                    # of hypothesis g lives at lane s*G*xs + g*xs + u
                    tile = jnp.concatenate(
                        [acc[:, s * gxs + g * xs:s * gxs + (g + 1) * xs]
                         for s in range(XS)], axis=1)
                out_ref[0, g] = (tile * inv_nm1).astype(out_dtype)

    if OFM == 2:
        pl.when(step_flag(pid))(compute_step)
    else:
        compute_step()


@functools.partial(
    jax.jit,
    static_argnames=("wb", "band_rows", "xblk", "align_corners", "lookahead",
                     "depth_group", "packed", "interpret", "ofmap_mode",
                     "x_subtiles", "sub_wb"))
def _fused_adaptive_volume(src_stack: jnp.ndarray, geom: jnp.ndarray,
                           ref_packed: jnp.ndarray,
                           depth_values: jnp.ndarray,
                           w1: jnp.ndarray, scalars: jnp.ndarray,
                           ofmap: jnp.ndarray | None = None, *,
                           wb: int = 192, band_rows: int = 16, xblk: int = 128,
                           align_corners: bool = False, lookahead: int = 2,
                           depth_group: int = 16,
                           packed: bool = False, interpret: bool = False,
                           ofmap_mode: int = 0,
                           x_subtiles: int = 1, sub_wb: int | None = None):
    """src_stack [V, B, H, W, C]; geom [V, B, 12]; ref_packed [B, H*C, W];
    depth_values [B, D, H, W] f32; w1 [C, 1] f32; scalars [4] f32 =
    (b1, w2, b2, 1/(N-1)). Returns (volume, overflow [1,1] i32), plus the
    per-cell overflow map [ncells, 1] i32 when ofmap_mode == 1 (the
    two-tier narrow pass); ofmap_mode == 2 takes that map as `ofmap` and
    computes only flagged cells (the wide repair pass)."""
    v, b, h, w, c = src_stack.shape
    d = depth_values.shape[1]
    if 128 % c or h % NY:
        raise ValueError("fused cost volume needs 128 % C == 0 and H % 8 == 0; "
                         "use the XLA path instead")
    ay = 128 // c
    xblk = xblk if w >= xblk else w
    # largest divisor of D within the depth_group budget
    g = max(k for k in range(1, min(depth_group, d) + 1) if d % k == 0)
    dg = d // g
    wbv = min(_round_up(wb + 7, 8), _round_up(w, 8))
    j = min(_round_up(band_rows + ay - 1, ay), _round_up(h, ay))
    wbp = wbv + 32
    jp = j + _round_up(NY + ay, ay)
    nxb = pl.cdiv(w, xblk)
    nyb = h // NY
    nsteps = b * dg * nyb * nxb * v
    sx, ox = _affine(w, align_corners)
    sy, oy = _affine(h, align_corners)

    hp = max(_round_up(h, ay) + ay, jp)
    wp = max(_round_up(w, 8) + 8, wbp)
    src_packed = jnp.zeros((v, b, wp, hp * c), src_stack.dtype)
    src_packed = jax.lax.dynamic_update_slice(
        src_packed,
        jnp.transpose(src_stack, (0, 1, 3, 2, 4)).reshape(v, b, w, h * c),
        (0, 0, 0, 0))
    # x-subtiling: each 128-lane step resolves XS lane groups with their
    # own (narrower) x-window; requires each subtile's lane count to stay
    # 128-aligned for the value slices
    xsub = x_subtiles
    if xsub > 1 and ((g * (xblk // xsub)) % 128 or xblk % xsub):
        xsub = 1
    swb = wbv if (sub_wb is None or xsub == 1) else min(
        _round_up(sub_wb + 7, 8), wbv)

    # pack hypotheses along lanes, subtile-major:
    # dvals[b, dg, y, xb*G*XBLK + s*G*xs + gi*xs + u]
    # = depth_values[b, dg*G + gi, y, xb*XBLK + s*xs + u] so each grid
    # step reads its row's hypotheses as one [1, G*XBLK] vector whose XS
    # lane groups are contiguous (for XS == 1 this is the classic g-major
    # packing)
    wpad = nxb * xblk
    dvals = depth_values.astype(jnp.float32)
    dvals = jnp.pad(dvals, ((0, 0), (0, 0), (0, 0), (0, wpad - w)))
    dvals = dvals.reshape(b, dg, g, h, nxb, xsub, xblk // xsub)
    dvals = dvals.transpose(0, 1, 3, 4, 5, 2, 6)
    dvals = dvals.reshape(b, dg, h, nxb * g * xblk)

    lkh = max(2, min(lookahead, nsteps))
    out_dtype = src_stack.dtype
    ncells = nsteps // v
    if ofmap is None:
        ofmap = jnp.zeros((1, 1), jnp.int32)  # dummy (modes 0/1)
    kern = functools.partial(
        _kernel, H=h, W=w, HP=hp, WP=wp, C=c, DG=dg, G=g, V=v, XBLK=xblk,
        WB=wbv, J=j, WBP=wbp, JP=jp, NYB=nyb, NXB=nxb, L=lkh,
        sx=sx, ox=ox, sy=sy, oy=oy, out_dtype=out_dtype, OFM=ofmap_mode,
        XS=xsub, SWB=swb)

    def cell_of(i):
        t = i // v
        xb = t % nxb
        t = t // nxb
        yb = t % nyb
        t = t // nyb
        return t // dg, t % dg, yb, xb  # (b, dgi, yb, xb)

    def dv_idx(i):
        return cell_of(i)

    def dv_next_idx(i):
        return cell_of(jnp.minimum(i + lkh - 1, nsteps - 1))

    def ref_idx(i):
        bb, _, yb, xb = cell_of(i)
        return bb, yb, xb

    def out_idx(i):
        bb, dgi, yb, xb = cell_of(i)
        return bb, dgi, yb, xb

    ofmap_out_cells = ncells if ofmap_mode == 1 else 1
    volume, overflow, ofmap_out = pl.pallas_call(
        kern,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, 1, NY, g * xblk), dv_idx),
            pl.BlockSpec((1, 1, NY, g * xblk), dv_next_idx),
            pl.BlockSpec(memory_space=pltpu.SMEM),        # geom [V, B, 12]
            pl.BlockSpec(memory_space=pltpu.SMEM),        # scalars [4]
            pl.BlockSpec(memory_space=pltpu.SMEM),        # ofmap (mode 2)
            pl.BlockSpec(memory_space=pltpu.HBM),         # src_packed
            pl.BlockSpec((1, NY * c, xblk), ref_idx),     # ref_packed
            pl.BlockSpec(memory_space=pltpu.VMEM),        # w1 [C, 1]
        ],
        out_specs=(
            pl.BlockSpec((1, g, NY * c, xblk), out_idx),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ofmap_out_cells, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, d, h * c, w), out_dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((ofmap_out_cells, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((lkh, wbp, jp * c), src_stack.dtype),
            pltpu.SemaphoreType.DMA((lkh,)),
            pltpu.SMEM((lkh, (1 + xsub) * NY + 3), jnp.int32),
            pltpu.VMEM((NY * c, g * xblk), jnp.float32),
        ],
        interpret=interpret,
    )(dvals, dvals, geom, scalars, ofmap, src_packed, ref_packed, w1)
    if not packed:
        volume = jnp.moveaxis(volume.reshape(b, d, h, c, w), 3, 4)
    if ofmap_mode == 1:
        return volume, overflow, ofmap_out
    return volume, overflow


@functools.partial(
    jax.jit,
    static_argnames=("wb", "band_rows", "narrow_wb", "narrow_band_rows",
                     "xblk", "align_corners", "lookahead", "depth_group",
                     "interpret", "x_subtiles", "sub_wb"))
def _two_tier_volume(src_stack, geom, ref_packed, depth_values, w1v,
                     scalars, *, wb, band_rows, narrow_wb, narrow_band_rows,
                     xblk=128, align_corners=False, lookahead=2,
                     depth_group=16, interpret=False,
                     x_subtiles=1, sub_wb=None):
    """Adaptive band sizing with static shapes: a narrow-window pass
    computes every cell and flags the (few) cells whose real span exceeds
    the narrow budget; a wide-window repair pass — skipped entirely via
    lax.cond when nothing is flagged — recomputes ONLY flagged cells
    (clean cells skip window math, band DMA and matmuls in-kernel) and
    the flagged output tiles are spliced in. FLOPs drop by roughly
    (narrow_wb * J_narrow) / (wb * J_wide) on the dominant x-resolve
    matmul (PERF.md round-5 notes) while the result stays tap-exact: a
    cell is either fully narrow-valid or fully wide-computed. Residual
    overflow (still too wide at the wide windows, or a z-sign-change)
    is reported in the returned scalar for the caller's XLA fallback."""
    v, b, h, w, c = src_stack.shape
    d = depth_values.shape[1]
    common = dict(xblk=xblk, align_corners=align_corners,
                  lookahead=lookahead, depth_group=depth_group,
                  interpret=interpret, packed=True)
    # x-subtiling applies to the narrow tier (the bulk of the FLOPs);
    # the rare wide repair pass stays single-window
    vol_n, _, ofmap = _fused_adaptive_volume(
        src_stack, geom, ref_packed, depth_values, w1v, scalars,
        wb=narrow_wb, band_rows=narrow_band_rows, ofmap_mode=1,
        x_subtiles=x_subtiles, sub_wb=sub_wb, **common)

    xb = xblk if w >= xblk else w
    g = max(k for k in range(1, min(depth_group, d) + 1) if d % k == 0)
    dg = d // g
    nxb = pl.cdiv(w, xb)
    nyb = h // NY
    wpad = nxb * xb

    def blockify(vol):
        vp = jnp.pad(vol, ((0, 0), (0, 0), (0, 0), (0, wpad - w)))
        return vp.reshape(b, dg, g, nyb, NY * c, nxb, xb)

    def repair(_):
        vol_w, of_w = _fused_adaptive_volume(
            src_stack, geom, ref_packed, depth_values, w1v, scalars,
            ofmap, wb=wb, band_rows=band_rows, ofmap_mode=2, **common)
        mask = (ofmap.reshape(b, dg, nyb, nxb)
                != 0)[:, :, None, :, None, :, None]
        merged = jnp.where(mask, blockify(vol_w), blockify(vol_n))
        merged = merged.reshape(b, d, h * c, wpad)[..., :w]
        return merged, of_w

    def keep(_):
        return vol_n, jnp.zeros((1, 1), jnp.int32)

    volume, overflow = jax.lax.cond(
        jnp.sum(jnp.minimum(ofmap, 1)) > 0, repair, keep, None)
    volume = jnp.moveaxis(volume.reshape(b, d, h, c, w), 3, 4)
    return volume, overflow


def fused_adaptive_cost_volume(ref_fea, src_feas, ref_proj, src_projs,
                               depth_values, w1, b1, w2, b2,
                               align_corners: bool = False,
                               wb: int = 192, band_rows: int = 16,
                               lookahead: int = 2, depth_group: int = 16,
                               interpret: bool = False,
                               two_tier: bool = False,
                               narrow_wb: int = 96,
                               narrow_band_rows: int = 8,
                               xblk: int = 128,
                               x_subtiles: int = 1,
                               sub_wb: int | None = None):
    """Drop-in for ops.costvol.build_cost_volume(mode="adaptive") at
    inference on TPU. ref_fea [B,H,W,C]; src_feas: list of [B,H,W,C];
    projs fused [B,4,4]; depth_values [B,D] or [B,D,H,W]; w1 [C] + scalars
    from nn.aggweight.fold_aggweight. Returns (volume [B,D,H,W,C],
    overflow [1,1] i32).

    two_tier=True enables per-cell adaptive band sizing: most cells pay
    only the narrow (narrow_wb x narrow_band_rows) window FLOPs, cells
    whose actual span exceeds it are recomputed at the (wb x band_rows)
    wide windows (see _two_tier_volume)."""
    b, h, w, c = ref_fea.shape
    if depth_values.ndim == 2:
        depth_values = jnp.broadcast_to(
            depth_values[:, :, None, None], depth_values.shape + (h, w))
    src_stack = jnp.stack(list(src_feas))  # [V, B, H, W, C]
    geom = jnp.stack([geom_from_projs(sp, ref_proj) for sp in src_projs])
    ref_packed = jnp.transpose(ref_fea, (0, 1, 3, 2)).reshape(b, h * c, w)
    nm1 = len(src_feas)
    scalars = jnp.stack([
        jnp.asarray(b1, jnp.float32), jnp.asarray(w2, jnp.float32),
        jnp.asarray(b2, jnp.float32),
        jnp.asarray(1.0 / nm1, jnp.float32)])
    w1v = jnp.asarray(w1, jnp.float32).reshape(c, 1)
    if two_tier:
        return _two_tier_volume(
            src_stack, geom, ref_packed, depth_values, w1v, scalars,
            wb=wb, band_rows=band_rows, narrow_wb=narrow_wb,
            narrow_band_rows=narrow_band_rows, align_corners=align_corners,
            lookahead=lookahead, depth_group=depth_group, xblk=xblk,
            interpret=interpret, x_subtiles=x_subtiles, sub_wb=sub_wb)
    return _fused_adaptive_volume(
        src_stack, geom, ref_packed, depth_values, w1v, scalars,
        wb=wb, band_rows=band_rows, align_corners=align_corners,
        lookahead=lookahead, depth_group=depth_group, xblk=xblk,
        interpret=interpret, x_subtiles=x_subtiles, sub_wb=sub_wb)
