"""End-to-end accuracy chain on the synthetic scene family.

Runs the full reference pipeline shape (SURVEY §3.1-§3.5) hermetically:

  1. train the cascade on procedural multi-view plane scenes
     (data/synthetic.py) with the full supervised + CPC loss,
  2. checkpoint (orbax) and restore weights-only (--loadckpt semantics),
  3. per-view depth inference through infer.runner.DepthRunner on a
     HELD-OUT scene exported to disk in the MVSNet eval layout,
  4. dypcd dynamic-consistency fusion -> colored PLY,
  5. DTU-protocol evaluation (eval/dtu_eval.evaluate_scan: 0.2 mm
     thinning, bidirectional NN distances, 20 mm cutoff) of the fused
     cloud against the analytic GT cloud,

and writes one JSON (default ACCURACY_r04.json) with the loss curve,
depth-map error statistics, and acc/comp/overall — the regression anchor
for later rounds.

Units: the synthetic world unit is mapped to 100 mm (plane at ~6 units ->
600 mm, DTU-like scale) so the protocol's mm thresholds are meaningful.

Usage:
    python scripts/e2e_synthetic.py --epochs 8 --out ACCURACY_r04.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MM_PER_UNIT = 100.0


def main(argv=None):
    p = argparse.ArgumentParser("e2e synthetic accuracy chain")
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--width", type=int, default=160)
    p.add_argument("--nviews", type=int, default=5)
    p.add_argument("--d0", type=int, default=48)
    p.add_argument("--ndepths", default="16,8,8")
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--epoch_len", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--conf", default="0.1,0.15,0.5",
                   help="dypcd photo-mask confidence triplet")
    p.add_argument("--workdir", default=None)
    p.add_argument("--out", default="ACCURACY_r04.json")
    p.add_argument("--platform", default=None,
                   help="cpu to force the host platform (default: env)")
    p.add_argument("--align_corners", action="store_true",
                   help="sample the cost volume with align_corners=True: "
                        "the reference's homo_warping normalizes with "
                        "(d-1)/2 but samples align_corners=False — an "
                        "internally inconsistent half-pixel convention "
                        "the default replicates for parity. On the "
                        "analytically-exact synthetic renderer that quirk "
                        "costs a measured ~+5 mm depth bias (the network "
                        "equilibrates between GT and photometric truth); "
                        "this flag removes it for accuracy regression runs")
    args = p.parse_args(argv)

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_damvsnet"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from damvsnet_tpu.data.common import DataLoader
    from damvsnet_tpu.data.general_eval import GeneralEvalDataset
    from damvsnet_tpu.data.synthetic import (SyntheticDataset,
                                             export_synthetic_scene)
    from damvsnet_tpu.core.pfm import read_pfm
    from damvsnet_tpu.core.ply import read_ply
    from damvsnet_tpu.eval.dtu_eval import evaluate_scan
    from damvsnet_tpu.infer.fusion_dypcd import dypcd_filter
    from damvsnet_tpu.infer.runner import DepthRunner, save_scene_depth
    from damvsnet_tpu.model import CascadeMVSNet
    from damvsnet_tpu.train.loop import Trainer
    from damvsnet_tpu.train.schedule import make_optimizer
    from damvsnet_tpu.train.state import (create_train_state,
                                          restore_checkpoint, save_checkpoint)

    t_start = time.time()
    workdir = args.workdir or tempfile.mkdtemp(prefix="e2e_synth_")
    datadir = os.path.join(workdir, "data")
    outdir = os.path.join(workdir, "outputs")
    logdir = os.path.join(workdir, "ckpt")
    os.makedirs(logdir, exist_ok=True)
    report = {"config": vars(args).copy(), "workdir": workdir,
              "device": str(jax.devices()[0])}
    print(f"workdir={workdir} device={jax.devices()[0]}", flush=True)

    # ---- 1. held-out eval scene on disk --------------------------------
    scan = "scan_synth"
    export_synthetic_scene(datadir, scan, height=args.height,
                           width=args.width, nviews=args.nviews, seed=10_000)

    # ---- 2. train -------------------------------------------------------
    ndepths = tuple(int(x) for x in args.ndepths.split(","))
    model = CascadeMVSNet(ndepths=ndepths, agg_mode="adaptive",
                          use_geo_fusion=True,
                          sampler_opts=({"align_corners": True}
                                        if args.align_corners else None))
    train_ds = SyntheticDataset(mode="train", nviews=args.nviews,
                                ndepths=args.d0, height=args.height,
                                width=args.width, length=args.epoch_len)
    loader = DataLoader(train_ds, args.batch_size, shuffle=True, seed=1,
                        num_workers=2)
    steps_per_epoch = len(loader)
    # decay x0.5 at 60% and 80% of the run (scaled reference recipe)
    ms = f"{max(1, int(args.epochs * 0.6))},{max(2, int(args.epochs * 0.8))}:2"
    tx, _ = make_optimizer(args.lr, ms, steps_per_epoch, 0.0,
                           warmup_iters=100)
    example = next(iter(DataLoader(train_ds, args.batch_size, num_workers=0)))
    example = {k: v for k, v in example.items() if k != "filename"}
    state = create_train_state(model, jax.random.PRNGKey(1), example, tx)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(state.params))
    report["n_params"] = n_params
    print(f"model: ndepths={ndepths}, {n_params:,} params", flush=True)

    trainer = Trainer(model, state, logdir, use_cpc=True, summary_freq=20)
    losses = []

    def arrays_only(batches):  # drop the filename template string
        for b in batches:
            yield {k: v for k, v in b.items() if k != "filename"}

    for epoch in range(args.epochs):
        t0 = time.time()
        means = trainer.train_epoch(arrays_only(loader))
        losses.append({k: round(float(v), 5) for k, v in means.items()})
        print(f"epoch {epoch}: {losses[-1]} ({time.time() - t0:.1f}s)",
              flush=True)
    report["train_curve"] = losses
    report["train_steps"] = int(trainer.state.step)

    # ---- 3. checkpoint roundtrip (weights-only load, test_uni.py:222) --
    ckpt_path = save_checkpoint(logdir, trainer.state)
    blank = create_train_state(model, jax.random.PRNGKey(2), example, tx)
    restored = restore_checkpoint(ckpt_path, blank, weights_only=True)
    variables = {"params": restored.params,
                 "batch_stats": restored.batch_stats}

    # ---- 4. inference on the held-out scene ----------------------------
    eval_ds = GeneralEvalDataset(datadir, [scan], "test", args.nviews,
                                 ndepths=args.d0, interval_scale=1.0,
                                 max_h=args.height, max_w=args.width)
    runner = DepthRunner(model, variables)
    n_views, infer_time, batch_times = save_scene_depth(
        runner, eval_ds, outdir, batch_size=1)
    steady = (sum(batch_times[1:]) / max(1, n_views - 1)
              if n_views > 1 else infer_time)
    report["inference"] = {"views": n_views,
                           "sec_per_view": round(steady, 3),
                           "first_batch_sec_incl_compile":
                               round(batch_times[0], 1),
                           "overflow_batches": runner.overflow_batches}

    # ---- 5. depth-map accuracy vs analytic GT --------------------------
    # NOTE the threshold is the stage-1 INPUT sweep interval (d0 steps over
    # the cam.txt range) — the ADIA-narrowed stage-3 interval is finer
    errs, in1itv = [], []
    interval_mm = (eval_ds[0]["depth_values"][1]
                   - eval_ds[0]["depth_values"][0]) * MM_PER_UNIT
    for v in range(args.nviews):
        est, _ = read_pfm(os.path.join(outdir, scan,
                                       f"depth_est/{v:08d}.pfm"))
        gt, _ = read_pfm(os.path.join(datadir, scan,
                                      f"gt_depths/{v:08d}.pfm"))
        e = np.abs(est - gt) * MM_PER_UNIT
        errs.append(float(e.mean()))
        in1itv.append(float((e < interval_mm).mean()))
    report["depth"] = {
        "abs_err_mm_mean": round(float(np.mean(errs)), 4),
        "abs_err_mm_per_view": [round(e, 4) for e in errs],
        "frac_within_1_interval": round(float(np.mean(in1itv)), 4),
        "input_interval_mm": round(float(interval_mm), 4),
    }
    print(f"depth abs err: {report['depth']['abs_err_mm_mean']} mm "
          f"(input interval {report['depth']['input_interval_mm']} mm)",
          flush=True)

    # ---- 6. dypcd fusion -> PLY (host/native-C++ backend) ---------------
    conf = tuple(float(x) for x in args.conf.split(","))
    dypcd_filter(datadir, outdir, [scan], conf=conf)
    ply_path = os.path.join(outdir, f"{scan}.ply")
    pred_pts, _ = read_ply(ply_path)
    report["fusion"] = {"points": int(len(pred_pts))}

    # ---- 6b. device-batched fusion backend over the SAME inputs ---------
    # (infer/fusion_tpu.py — the gipuma-equivalent engine; VERDICT r3
    # item 7 asks for both backends exercised in one dress rehearsal)
    os.replace(ply_path, ply_path + ".dypcd")
    from damvsnet_tpu.infer.fusion_tpu import consistency_filter
    consistency_filter(datadir, outdir, [scan], conf=conf)
    pred_pts_tpu, _ = read_ply(ply_path)
    os.replace(ply_path, ply_path + ".tpu")
    os.replace(ply_path + ".dypcd", ply_path)
    report["fusion"]["points_tpu_backend"] = int(len(pred_pts_tpu))

    # ---- 7. DTU-protocol eval vs GT cloud (both backends) ---------------
    gt_pts = np.load(os.path.join(datadir, scan, "gt_points.npy"))
    r = evaluate_scan(pred_pts.astype(np.float64) * MM_PER_UNIT,
                      gt_pts.astype(np.float64) * MM_PER_UNIT,
                      dst=0.2, max_dist=20.0)
    report["dtu_protocol"] = {k: (round(v, 4) if isinstance(v, float) else v)
                              for k, v in r.items()}
    r_tpu = evaluate_scan(pred_pts_tpu.astype(np.float64) * MM_PER_UNIT,
                          gt_pts.astype(np.float64) * MM_PER_UNIT,
                          dst=0.2, max_dist=20.0)
    report["dtu_protocol_tpu_backend"] = {
        k: (round(v, 4) if isinstance(v, float) else v)
        for k, v in r_tpu.items()}
    report["elapsed_sec"] = round(time.time() - t_start, 1)
    print(f"fused {len(pred_pts)} pts | acc={r['acc']:.4f} mm "
          f"comp={r['comp']:.4f} mm overall={r['overall']:.4f} mm | "
          f"tpu backend {len(pred_pts_tpu)} pts overall={r_tpu['overall']:.4f}",
          flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out} in {report['elapsed_sec']}s", flush=True)
    return report


if __name__ == "__main__":
    main()
