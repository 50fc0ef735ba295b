"""Custom VJP for the fused adaptive cost-volume kernel (training path).

Forward = ops/pallas/fused_costvol.py (banded warp + diff^2 + folded
AggWeightNet + view accumulation, one pass, no per-view HBM volumes).
This module adds the backward Pallas kernel so the reference's PRIMARY
mode — training (/root/reference/train.py:92-172) — also runs the fused
path instead of falling back to the XLA gather sampler.

Gradient semantics match the reference exactly where it matters:
``homo_warping`` builds its sampling grid under ``torch.no_grad()``
(/root/reference/models/module.py:297-300), so NO gradient flows through
depth hypotheses or camera geometry — only through the feature values
(the bilinear taps are linear in the source features) and the weight
net. The VJP therefore returns zero cotangents for depth_values/geom
(identical to torch) and analytic gradients for:

  ref_fea   d/dref  [(w+1)(ref-warp)^2] incl. the w(s) chain,
  src_feas  the transpose of the banded one-hot x-resolve matmul —
            itself a banded matmul of the same shape family, scattered
            into the packed source-gradient buffer by sequential-grid
            read-modify-write band DMAs (TPU Pallas grids execute
            sequentially, so RMW accumulation is race-free),
  w1,b1,w2,b2  reductions accumulated in a resident f32 block.

Derivation (per voxel, per view; s = sum_c w1_c d2_c, r = relu(s+b1),
g = w2 r + b2, w = relu(g), out_c = (w+1) d2_c / (N-1)):

  dL/dd2_e = inv [ ct_e (w+1) + (sum_c ct_c d2_c) 1[g>0] w2 1[s+b1>0] w1_e ]
  dL/ddiff = 2 diff dL/dd2;  dL/dref = +dL/ddiff;  dL/dwarp = -dL/ddiff
  dL/dw1_c = sum 1[g>0] w2 1[s+b1>0] inv q d2_c   (q = sum_c ct_c d2_c)
  dL/db1   = sum 1[g>0] w2 1[s+b1>0] inv q
  dL/dw2   = sum 1[g>0] inv q r;   dL/db2 = sum 1[g>0] inv q

The grid is reordered vs the forward — (b, yb, xb, DG, V) with the depth
group and view INNERMOST — so the d_ref output block (indexed by cell
only) stays resident in VMEM while every (hypothesis-group, view) pair
accumulates into it.

The folded weight-net form means BatchNorm inside AggWeightNet uses
RUNNING statistics during training when this path is enabled (a frozen-
BN deviation on the two 1-channel 1x1x1 convs only; the cost-volume
math itself is exact). Gradient parity vs an independent XLA
implementation: tests/test_fused_costvol_vjp.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sweep_sampler import NY, _affine, _round_up, geom_from_projs
from .fused_costvol import _fused_adaptive_volume

_HIGHEST = jax.lax.Precision.HIGHEST


def _kernel_bwd(dv_ref, geom_ref, scal_ref, ref_ref, cot_ref, w1_ref,
                src_ref, dsrc_in_ref,
                dref_ref, dsrc_ref, dw_ref,
                band, dband, sem_r, sem_a, sem_w,
                *, H, W, HP, WP, C, DG, G, V, XBLK, WB, J, WBP, JP,
                NYB, NXB, sx, ox, sy, oy):
    pid = pl.program_id(0)
    AY = 128 // C
    jc = J * C
    GX = G * XBLK

    # (b, yb, xb, dg, v) with dg/v innermost: the d_ref block is revisited
    # for DG*V consecutive steps and stays resident in VMEM
    v = pid % V
    t = pid // V
    dg = t % DG
    t = t // DG
    xb = t % NXB
    t = t // NXB
    yb = t % NYB
    b = t // NYB

    def pxpy_z(dv, y, n):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        xf = jax.lax.rem(lane, XBLK).astype(jnp.float32) + (
            xb.astype(jnp.float32) * XBLK)
        yf = y.astype(jnp.float32)
        g = lambda k: geom_ref[v, b, k]
        nx = (g(0) * xf + (g(1) * yf + g(2))) * dv + g(9)
        ny = (g(3) * xf + (g(4) * yf + g(5))) * dv + g(10)
        z = (g(6) * xf + (g(7) * yf + g(8))) * dv + g(11)
        px = nx / z * sx + ox
        py = ny / z * sy + oy
        return px, py, z

    def row_span(y, dv_row):
        """Identical math to the forward's group_row_span (fused_costvol.py)
        INCLUDING the z-sign-change guard: both passes must exclude the same
        lanes from the span min so they pick identical band placements —
        otherwise gradients are silently computed against different taps
        than the forward values on a degenerate rig. Returns the span
        extents too so the backward can raise its own overflow flag."""
        dvlo = dv_row[:, :XBLK]
        dvhi = dv_row[:, :XBLK]
        for gi in range(1, G):
            sl = dv_row[:, gi * XBLK:(gi + 1) * XBLK]
            dvlo = jnp.minimum(dvlo, sl)
            dvhi = jnp.maximum(dvhi, sl)
        px0, py0, z0 = pxpy_z(dvlo, y, XBLK)
        px1, py1, z1 = pxpy_z(dvhi, y, XBLK)
        # global pixel x (mirrors the forward): padding lanes with zero
        # depth and exact-zero z must not raise a spurious zcross
        lane_ok = (jax.lax.broadcasted_iota(jnp.int32, (1, XBLK), 1)
                   + xb * XBLK) < W
        zcross = lane_ok & (z0 * z1 <= 0.0)
        fin = (jnp.isfinite(px0) & jnp.isfinite(py0)
               & jnp.isfinite(px1) & jnp.isfinite(py1))
        eps = 1e-3
        pxlo = jnp.minimum(px0, px1) - eps
        pylo = jnp.minimum(py0, py1) - eps
        pxhi = jnp.maximum(px0, px1) + eps
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

    # cell band placement (identical math to the forward's stage_step)
    spans = []
    of_bwd = jnp.int32(0)
    for r in range(NY):
        s = row_span(yb * NY + r, dv_ref[0, 0, r:r + 1])
        spans.append(s[:4])
        of_bwd = of_bwd | s[4]
    ymin_c = spans[0][0]
    xmin_c = spans[0][1]
    for r in range(1, NY):
        ymin_c = jnp.minimum(ymin_c, spans[r][0])
        xmin_c = jnp.minimum(xmin_c, spans[r][1])
    ybase_c = jnp.clip(ymin_c, 0, HP - JP) // AY * AY
    xbase_c = jnp.clip(xmin_c, 0, WP - WBP) // 8 * 8

    # band reads: source features (bf16) + current d_src accumulator (f32)
    pltpu.make_async_copy(
        src_ref.at[v, b, pl.ds(pl.multiple_of(xbase_c, 8), WBP),
                   pl.ds(pl.multiple_of(ybase_c * C, 128), JP * C)],
        band, sem_r).start()
    pltpu.make_async_copy(
        dsrc_ref.at[v, b, pl.ds(pl.multiple_of(xbase_c, 8), WBP),
                    pl.ds(pl.multiple_of(ybase_c * C, 128), JP * C)],
        dband, sem_a).start()
    pltpu.make_async_copy(
        src_ref.at[v, b, pl.ds(pl.multiple_of(xbase_c, 8), WBP),
                   pl.ds(pl.multiple_of(ybase_c * C, 128), JP * C)],
        band, sem_r).wait()
    pltpu.make_async_copy(
        dsrc_ref.at[v, b, pl.ds(pl.multiple_of(xbase_c, 8), WBP),
                    pl.ds(pl.multiple_of(ybase_c * C, 128), JP * C)],
        dband, sem_a).wait()

    @pl.when(pid == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    first_cell_step = (dg == 0) & (v == 0)

    b1 = scal_ref[0]
    w2 = scal_ref[1]
    b2 = scal_ref[2]
    inv_nm1 = scal_ref[3]
    w1 = w1_ref[:]  # [C, 1] f32
    mm_prec = (_HIGHEST if band.dtype == jnp.float32
               else jax.lax.Precision.DEFAULT)
    o_iota = jax.lax.broadcasted_iota(jnp.int32, (WB, GX), 0)
    lane_wide = jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, (1, GX), 1), XBLK)
    lane_ok_w = (lane_wide + xb * XBLK) < W  # [1, GX]

    dw1_acc = jnp.zeros((1, 128), jnp.float32)
    db1_acc = jnp.float32(0.0)
    dw2_acc = jnp.float32(0.0)
    db2_acc = jnp.float32(0.0)

    for r in range(NY):
        px, py, _ = pxpy_z(dv_ref[0, 0, r:r + 1], yb * NY + r, GX)
        ymin, xmin, ytop, xtop = spans[r]
        ybase_r = jnp.clip(jnp.clip(ymin, 0, HP - J) // AY * AY,
                           ybase_c, ybase_c + (JP - J))
        xbase_r = jnp.clip(jnp.clip(xmin, 0, WP - WB) // 8 * 8,
                           xbase_c, xbase_c + (WBP - WB))
        of_bwd = of_bwd | ((xtop - xbase_r > WB - 1)
                           | (ytop - ybase_r > J - 1)).astype(jnp.int32)
        yoff = ybase_r - ybase_c
        xoff = xbase_r - xbase_c
        sub = band[pl.ds(pl.multiple_of(xoff, 8), WB),
                   pl.ds(pl.multiple_of(yoff * C, 128), jc)]

        fin = jnp.isfinite(px) & jnp.isfinite(py)
        pxc = jnp.where(fin, jnp.clip(px, -2.0, W + 1.0), -2.0)
        o_ids = o_iota + xbase_r
        wxt = jnp.maximum(0.0, 1.0 - jnp.abs(pxc - o_ids.astype(jnp.float32)))
        wxt = jnp.where(o_ids <= W - 1, wxt, 0.0)  # [WB, GX]
        warp_jc = jax.lax.dot_general(
            sub, wxt.astype(band.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mm_prec)  # [J*C, GX]

        pyc = jnp.where(fin, jnp.clip(py, -2.0, H + 1.0), -2.0)
        warp = jnp.zeros((C, GX), jnp.float32)
        ms = []
        for j in range(J):
            row = ybase_r + j
            m = jnp.maximum(0.0, 1.0 - jnp.abs(pyc - row.astype(jnp.float32)))
            m = jnp.where(row <= H - 1, m, 0.0)
            ms.append(m)
            warp = warp + m * warp_jc[j * C:(j + 1) * C, :]

        ref_row = ref_ref[0, r * C:(r + 1) * C, :].astype(jnp.float32)
        ref_tile = jnp.concatenate([ref_row] * G, axis=1)  # [C, GX]
        diff = ref_tile - warp
        d2 = diff * diff
        s = jnp.sum(d2 * w1, axis=0, keepdims=True)  # [1, GX]
        r1 = s + b1
        gpre = w2 * jnp.maximum(r1, 0.0) + b2
        wgt = jnp.maximum(gpre, 0.0)

        # masked cotangent tile for this row: [C, GX]
        ct = cot_ref[0, :, r * C:(r + 1) * C, :]  # [G, C, XBLK]
        ct = jnp.concatenate([ct[gi] for gi in range(G)], axis=1)
        ct = jnp.where(lane_ok_w, ct.astype(jnp.float32), 0.0)

        q = jnp.sum(ct * d2, axis=0, keepdims=True)  # [1, GX]
        gate2 = (gpre > 0.0).astype(jnp.float32)
        gate1 = (r1 > 0.0).astype(jnp.float32)
        qg = q * inv_nm1 * gate2                      # dL/dwgt_pre-relu
        ds = qg * w2 * gate1                          # dL/ds
        dd2 = inv_nm1 * ct * (wgt + 1.0) + ds * w1    # [C, GX]
        ddiff = 2.0 * diff * dd2

        # weight-net partials (lane sums; padded lanes already masked)
        db2_acc = db2_acc + jnp.sum(qg)
        dw2_acc = dw2_acc + jnp.sum(qg * jnp.maximum(r1, 0.0))
        db1_acc = db1_acc + jnp.sum(ds)
        dw1_row = jnp.sum(d2 * ds, axis=1)  # [C]
        dw1_acc = dw1_acc + jnp.pad(dw1_row, (0, 128 - C))[None, :]

        # d_ref: +ddiff summed over the G hypothesis groups
        dref_row = ddiff[:, :XBLK]
        for gi in range(1, G):
            dref_row = dref_row + ddiff[:, gi * XBLK:(gi + 1) * XBLK]

        @pl.when(first_cell_step)
        def _(dref_row=dref_row, r=r):
            dref_ref[0, r * C:(r + 1) * C, :] = dref_row

        @pl.when(~first_cell_step)
        def _(dref_row=dref_row, r=r):
            dref_ref[0, r * C:(r + 1) * C, :] = (
                dref_ref[0, r * C:(r + 1) * C, :] + dref_row)

        # d_src: transpose of the two resolves. y: d_warp_jc[j] = m_j *
        # (-ddiff); x: d_sub [WB, jc] = wxt @ d_warp_jc^T — the banded
        # matmul transpose. Accumulate into the f32 d-band.
        dwarp = -ddiff  # [C, GX]
        dwarp_jc = jnp.concatenate([ms[j] * dwarp for j in range(J)],
                                   axis=0)  # [J*C, GX]
        dsub = jax.lax.dot_general(
            wxt.astype(jnp.float32), dwarp_jc,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mm_prec)  # [WB, J*C]
        cur = dband[pl.ds(pl.multiple_of(xoff, 8), WB),
                    pl.ds(pl.multiple_of(yoff * C, 128), jc)]
        dband[pl.ds(pl.multiple_of(xoff, 8), WB),
              pl.ds(pl.multiple_of(yoff * C, 128), jc)] = cur + dsub

    dw_ref[0:1, :] = dw_ref[0:1, :] + dw1_acc
    dw_ref[1:2, :] = dw_ref[1:2, :] + jnp.full((1, 128), db1_acc)
    dw_ref[2:3, :] = dw_ref[2:3, :] + jnp.full((1, 128), dw2_acc)
    dw_ref[3:4, :] = dw_ref[3:4, :] + jnp.full((1, 128), db2_acc)
    # backward tap-drop/zcross overflow flag (dw row 4; rows 5-7 spare):
    # nonzero <=> this pass dropped taps or saw a z-sign change. With the
    # mirrored span math above it should equal the forward's flag on any
    # rig; tests/test_fused_costvol_vjp.py asserts the parity.
    dw_ref[4:5, :] = jnp.maximum(dw_ref[4:5, :],
                                 jnp.full((1, 128), of_bwd.astype(jnp.float32)))

    # write the accumulated band back; wait immediately so the next grid
    # step's read of a possibly-overlapping band sees the update
    pltpu.make_async_copy(
        dband,
        dsrc_ref.at[v, b, pl.ds(pl.multiple_of(xbase_c, 8), WBP),
                    pl.ds(pl.multiple_of(ybase_c * C, 128), JP * C)],
        sem_w).start()
    pltpu.make_async_copy(
        dband,
        dsrc_ref.at[v, b, pl.ds(pl.multiple_of(xbase_c, 8), WBP),
                    pl.ds(pl.multiple_of(ybase_c * C, 128), JP * C)],
        sem_w).wait()


@functools.partial(
    jax.jit,
    static_argnames=("wb", "band_rows", "xblk", "align_corners",
                     "depth_group", "interpret"))
def _fused_backward(src_stack, geom, ref_packed, depth_values, w1v, scalars,
                    cot_packed, *, wb, band_rows, xblk, align_corners,
                    depth_group, interpret):
    """cot_packed [B, D, H*C, W] f32 -> (dref_packed [B, H*C, W],
    dsrc_packed [V, B, WP, HP*C] f32, dw [8, 128] f32)."""
    v, b, h, w, c = src_stack.shape
    d = depth_values.shape[1]
    ay = 128 // c
    xblk = xblk if w >= xblk else w
    g = max(k for k in range(1, min(depth_group, d) + 1) if d % k == 0)
    dg = d // g
    wbv = min(_round_up(wb + 7, 8), _round_up(w, 8))
    j = min(_round_up(band_rows + ay - 1, ay), _round_up(h, ay))
    wbp = wbv + 32
    jp = j + _round_up(NY + ay, ay)
    nxb = pl.cdiv(w, xblk)
    nyb = h // NY
    nsteps = b * nyb * nxb * dg * v
    sx, ox = _affine(w, align_corners)
    sy, oy = _affine(h, align_corners)
    hp = max(_round_up(h, ay) + ay, jp)
    wp = max(_round_up(w, 8) + 8, wbp)

    src_packed = jnp.zeros((v, b, wp, hp * c), src_stack.dtype)
    src_packed = jax.lax.dynamic_update_slice(
        src_packed,
        jnp.transpose(src_stack, (0, 1, 3, 2, 4)).reshape(v, b, w, h * c),
        (0, 0, 0, 0))
    wpad = nxb * xblk
    dvals = depth_values.astype(jnp.float32)
    dvals = jnp.pad(dvals, ((0, 0), (0, 0), (0, 0), (0, wpad - w)))
    dvals = dvals.reshape(b, dg, g, h, nxb, xblk).transpose(0, 1, 3, 4, 2, 5)
    dvals = dvals.reshape(b, dg, h, nxb * g * xblk)

    dsrc_zero = jnp.zeros((v, b, wp, hp * c), jnp.float32)

    kern = functools.partial(
        _kernel_bwd, H=h, W=w, HP=hp, WP=wp, C=c, DG=dg, G=g, V=v,
        XBLK=xblk, WB=wbv, J=j, WBP=wbp, JP=jp, NYB=nyb, NXB=nxb,
        sx=sx, ox=ox, sy=sy, oy=oy)

    def cell_of(i):
        t = i // (dg * v)
        xb = t % nxb
        t = t // nxb
        yb = t % nyb
        return t // nyb, yb, xb  # (b, yb, xb)

    def dv_idx(i):
        bb, yb, xb = cell_of(i)
        return bb, (i // v) % dg, yb, xb

    def ref_idx(i):
        return cell_of(i)

    def cot_idx(i):
        bb, yb, xb = cell_of(i)
        return bb, (i // v) % dg, yb, xb

    dref, dsrc, dw = pl.pallas_call(
        kern,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, 1, NY, g * xblk), dv_idx),
            pl.BlockSpec(memory_space=pltpu.SMEM),       # geom
            pl.BlockSpec(memory_space=pltpu.SMEM),       # scalars
            pl.BlockSpec((1, NY * c, xblk), ref_idx),    # ref_packed
            pl.BlockSpec((1, g, NY * c, xblk), cot_idx),  # cot_packed
            pl.BlockSpec(memory_space=pltpu.VMEM),       # w1 [C, 1]
            pl.BlockSpec(memory_space=pltpu.HBM),        # src_packed
            pl.BlockSpec(memory_space=pltpu.HBM),        # dsrc (aliased)
        ],
        out_specs=(
            pl.BlockSpec((1, NY * c, xblk), ref_idx),    # dref_packed
            pl.BlockSpec(memory_space=pltpu.HBM),        # dsrc_packed
            pl.BlockSpec((8, 128), lambda i: (0, 0)),    # dw
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h * c, w), jnp.float32),
            jax.ShapeDtypeStruct((v, b, wp, hp * c), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((wbp, jp * c), src_stack.dtype),
            pltpu.VMEM((wbp, jp * c), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={7: 1},
        interpret=interpret,
    )(dvals, geom, scalars, ref_packed, cot_packed, w1v, src_packed,
      dsrc_zero)
    return dref, dsrc, dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_trainable(opts, ref_fea, src_stack, geom, depth_values, w1v,
                     scalars):
    wb, band_rows, xblk, align_corners, depth_group, interpret, lkh = opts
    b, h, w, c = ref_fea.shape
    ref_packed = jnp.transpose(ref_fea, (0, 1, 3, 2)).reshape(b, h * c, w)
    return _fused_adaptive_volume(
        src_stack, geom, ref_packed, depth_values, w1v, scalars,
        wb=wb, band_rows=band_rows, xblk=xblk, align_corners=align_corners,
        depth_group=depth_group, lookahead=lkh, interpret=interpret)


def _fused_trainable_fwd(opts, ref_fea, src_stack, geom, depth_values, w1v,
                         scalars):
    out = _fused_trainable(opts, ref_fea, src_stack, geom, depth_values,
                           w1v, scalars)
    return out, (ref_fea, src_stack, geom, depth_values, w1v, scalars)


def _fused_trainable_bwd(opts, res, cots):
    wb, band_rows, xblk, align_corners, depth_group, interpret, _ = opts
    ref_fea, src_stack, geom, depth_values, w1v, scalars = res
    cot_vol, _ = cots  # overflow flag carries no gradient
    v, b, h, w, c = src_stack.shape
    ref_packed = jnp.transpose(ref_fea, (0, 1, 3, 2)).reshape(b, h * c, w)
    # [B, D, H, W, C] -> the kernel's packed [B, D, H*C, W] layout
    cot_packed = jnp.moveaxis(cot_vol.astype(jnp.float32), 4, 3)
    cot_packed = cot_packed.reshape(b, cot_vol.shape[1], h * c, w)
    dref_p, dsrc_p, dw = _fused_backward(
        src_stack, geom, ref_packed, depth_values, w1v, scalars, cot_packed,
        wb=wb, band_rows=band_rows, xblk=xblk, align_corners=align_corners,
        depth_group=depth_group, interpret=interpret)
    dref = jnp.moveaxis(dref_p.reshape(b, h, c, w), 2, 3)
    dsrc = dsrc_p[:, :, :w, :h * c].reshape(v, b, w, h, c)
    dsrc = jnp.transpose(dsrc, (0, 1, 3, 2, 4))
    dw1 = dw[0, :c].reshape(c, 1)
    dscal = jnp.stack([dw[1, 0], dw[2, 0], dw[3, 0],
                       jnp.float32(0.0)])  # inv_nm1 is a constant
    return (dref.astype(ref_fea.dtype), dsrc.astype(src_stack.dtype),
            jnp.zeros_like(geom), jnp.zeros_like(depth_values),
            dw1, dscal)


_fused_trainable.defvjp(_fused_trainable_fwd, _fused_trainable_bwd)


def fused_adaptive_cost_volume_vjp(ref_fea, src_feas, ref_proj, src_projs,
                                   depth_values, w1, b1, w2, b2,
                                   align_corners: bool = False,
                                   wb: int = 192, band_rows: int = 16,
                                   lookahead: int = 2, depth_group: int = 16,
                                   interpret: bool = False):
    """Differentiable drop-in for fused_adaptive_cost_volume: same forward
    kernel, Pallas backward. Gradients flow to ref_fea/src_feas/w1/b1/
    w2/b2; depth_values and geometry get zero cotangents (parity with the
    reference's no_grad warp grid, module.py:297-300)."""
    b, h, w, c = ref_fea.shape
    if depth_values.ndim == 2:
        depth_values = jnp.broadcast_to(
            depth_values[:, :, None, None], depth_values.shape + (h, w))
    src_stack = jnp.stack(list(src_feas))
    geom = jax.lax.stop_gradient(
        jnp.stack([geom_from_projs(sp, ref_proj) for sp in src_projs]))
    nm1 = len(src_feas)
    scalars = jnp.stack([
        jnp.asarray(b1, jnp.float32), jnp.asarray(w2, jnp.float32),
        jnp.asarray(b2, jnp.float32),
        jax.lax.stop_gradient(jnp.asarray(1.0 / nm1, jnp.float32))])
    w1v = jnp.asarray(w1, jnp.float32).reshape(c, 1)
    opts = (wb, band_rows, 128, align_corners, depth_group, interpret,
            lookahead)
    return _fused_trainable(opts, ref_fea, src_stack, geom,
                            jax.lax.stop_gradient(depth_values), w1v, scalars)
