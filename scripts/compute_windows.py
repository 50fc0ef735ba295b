"""Analytic window-budget calculator for the banded fused cost volume.

Mirrors the kernel's span math (ops/pallas/fused_costvol.py group_row_span
+ stage_step base clamping) in numpy for a given camera rig and reports,
per stage and per source view, the minimal (wb, band_rows) window budget
that cannot drop taps for FULL-SWEEP hypothesis groups — the worst case
under clamp_samples=True (any ADIA group hull is a sub-interval of the
full sweep, and px/py are monotone in d wherever z keeps sign, so the
full-sweep hull bounds every group hull).

Usage:
    python scripts/compute_windows.py            # reference DTU train rig
    python scripts/compute_windows.py --eval     # 1152x864 eval geometry
Runs entirely on host (numpy) — no TPU needed.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NY = 8
XBLK = 128


def stage_windows(geom, h, w, c, dlo, dhi, align_corners=False):
    """geom: [12] per view (the kernel's fused row-major projection rows);
    returns required (wb, band_rows) for the [dlo, dhi] hypothesis hull."""
    ay = 128 // c
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")

    def pxpy(d):
        nx = (geom[0] * xs + geom[1] * ys + geom[2]) * d + geom[9]
        ny = (geom[3] * xs + geom[4] * ys + geom[5]) * d + geom[10]
        z = (geom[6] * xs + geom[7] * ys + geom[8]) * d + geom[11]
        if align_corners:
            sx, ox = 1.0, 0.0
            sy, oy = 1.0, 0.0
        else:
            # the kernel's (d-1)/2-style affine: _affine(n, False)
            sx, ox = 1.0, 0.0
            sy, oy = 1.0, 0.0
        return nx / z, ny / z, z

    px0, py0, z0 = pxpy(dlo)
    px1, py1, z1 = pxpy(dhi)
    eps = 1e-3
    ok = (z0 * z1 > 0)
    pxlo = np.minimum(px0, px1) - eps
    pxhi = np.maximum(px0, px1) + eps
    pylo = np.minimum(py0, py1) - eps
    pyhi = np.maximum(py0, py1) + eps
    semi = ok & (pxhi > -1) & (pxlo < w) & (pyhi > -1) & (pylo < h)

    wb_req = 0
    rows_req = 0
    per_cell = []  # (wb, rows) needed per output cell — the narrow-tier
    # sizing statistic (narrow should cover ~p95+ of cells)
    nyb = h // NY
    nxb = -(-w // XBLK)
    for yb in range(nyb):
        for xb in range(nxb):
            cell_wb = 0
            cell_rows_req = 0
            for r in range(NY):
                y = yb * NY + r
                sl = slice(xb * XBLK, min((xb + 1) * XBLK, w))
                m = semi[y, sl]
                if not m.any():
                    continue
                xmin = np.clip(pxlo[y, sl][m].min(), -1, w)
                xmax = np.clip(pxhi[y, sl][m].max(), -1, w)
                ymin = np.clip(pylo[y, sl][m].min(), -1, h)
                ymax = np.clip(pyhi[y, sl][m].max(), -1, h)
                # row base alignment: floor to x8 / xAY like the kernel
                # (ignoring the cell-clamp slack => slightly conservative)
                ytop = min(np.floor(ymax) + 1, h - 1)
                xtop = min(np.floor(xmax) + 1, w - 1)
                xbase = max(np.floor(xmin), 0) // 8 * 8
                ybase = max(np.floor(ymin), 0) // ay * ay
                cell_wb = max(cell_wb, int(xtop - xbase + 1))
                cell_rows_req = max(cell_rows_req, int(ytop - ybase + 1))
            if not cell_wb:
                continue
            per_cell.append((cell_wb, cell_rows_req))
            wb_req = max(wb_req, cell_wb)
            rows_req = max(rows_req, cell_rows_req)
    return wb_req, rows_req, per_cell


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval", action="store_true",
                    help="1152x864 eval geometry instead of 512x640 train")
    ap.add_argument("--scene", action="store_true",
                    help="use the rendered synthetic-scene rig "
                         "(data/synthetic.py — the kernel-parity/bench "
                         "rig) instead of the __graft_entry__ noise rig")
    ap.add_argument("--nviews", type=int, default=5)
    ap.add_argument("--d0", type=int, default=192)
    args = ap.parse_args()
    h, w = (864, 1152) if args.eval else (512, 640)

    from damvsnet_tpu.ops.pallas.sweep_sampler import geom_from_projs
    from damvsnet_tpu.model.cascade import fuse_projection_matrices
    import jax.numpy as jnp

    if args.scene:
        from damvsnet_tpu.data.synthetic import make_synthetic_sample
        sample = make_synthetic_sample(height=h, width=w,
                                       nviews=args.nviews,
                                       ndepths=args.d0, with_gt=False,
                                       seed=3)
        proj_ms = {k: v[None] for k, v in sample["proj_matrices"].items()}
        dv = np.asarray(sample["depth_values"])
    else:
        from __graft_entry__ import _example_batch
        batch = _example_batch(batch=1, nviews=args.nviews, height=h,
                               width=w, d0=args.d0)
        proj_ms = batch["proj_matrices"]
        dv = np.asarray(batch["depth_values"])[0]
    chans = {1: 32, 2: 16, 3: 8}
    for s in (1, 2, 3):
        scale = 2 ** (3 - s)
        hs, ws = h // scale, w // scale
        projs = np.asarray(proj_ms[f"stage{s}"])
        fused = np.asarray(fuse_projection_matrices(jnp.asarray(projs)))
        ref = fused[:, 0]
        need = (0, 0)
        cells = []
        for v in range(1, args.nviews):
            g = np.asarray(geom_from_projs(jnp.asarray(fused[:, v]),
                                           jnp.asarray(ref)))[0]
            wb, rows, per_cell = stage_windows(g, hs, ws, chans[s],
                                               float(dv.min()),
                                               float(dv.max()))
            need = (max(need[0], wb), max(need[1], rows))
            cells.extend(per_cell)
        wbs = np.array([c[0] for c in cells])
        rws = np.array([c[1] for c in cells])
        print(f"stage{s} ({ws}x{hs}, C={chans[s]}): full-sweep "
              f"wb>={need[0]}, band_rows>={need[1]} | per-cell wb "
              f"p50={int(np.percentile(wbs, 50))} "
              f"p95={int(np.percentile(wbs, 95))} "
              f"p99={int(np.percentile(wbs, 99))}; rows "
              f"p50={int(np.percentile(rws, 50))} "
              f"p95={int(np.percentile(rws, 95))} "
              f"p99={int(np.percentile(rws, 99))}")


if __name__ == "__main__":
    main()
