"""Inference + fusion CLI.

Parity with /root/reference/test_uni.py:95-117,504-533: run per-scene depth
inference, then dispatch filter_method in {pcd, dypcd, consistency}.

    python -m damvsnet_tpu.cli.test --dataset general_eval \
        --testpath ... --testlist lists/dtu/test.txt --loadckpt ... \
        --outdir ./outputs --filter_method dypcd
"""
from __future__ import annotations

import argparse
import os


def build_parser():
    p = argparse.ArgumentParser("damvsnet-tpu test")
    p.add_argument("--dataset", default="general_eval")
    p.add_argument("--testpath", required=True)
    p.add_argument("--testlist", required=True)
    p.add_argument("--loadckpt", default=None)
    p.add_argument("--outdir", default="./outputs")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--numdepth", type=int, default=192)
    p.add_argument("--interval_scale", type=float, default=1.06)
    p.add_argument("--num_view", type=int, default=5)
    p.add_argument("--max_h", type=int, default=864)
    p.add_argument("--max_w", type=int, default=1152)
    p.add_argument("--fix_res", action="store_true")
    p.add_argument("--ndepths", default="64,32,8")
    p.add_argument("--depth_inter_r", default="4,2,1")
    p.add_argument("--cr_base_chs", default="8,8,8")
    p.add_argument("--share_cr", action="store_true")
    p.add_argument("--grad_method", default="detach")
    p.add_argument("--agg_mode", default="adaptive")
    p.add_argument("--use_fmt", action="store_true")
    p.add_argument("--no_geo_fusion", action="store_true")
    # fusion
    p.add_argument("--filter_method", default="dypcd",
                   choices=["pcd", "dypcd", "consistency", "none"])
    p.add_argument("--conf", default="0.1,0.15,0.9")
    p.add_argument("--thres_view", type=int, default=5)
    p.add_argument("--dist_base", type=float, default=0.25)
    p.add_argument("--rel_diff_base", type=float, default=1.0 / 1300)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax

    from ..data import find_dataset_def
    from ..model import CascadeMVSNet
    from ..infer.runner import DepthRunner, save_scene_depth
    from ..infer.fusion_dypcd import dypcd_filter
    from ..infer.fusion_pcd import pcd_filter
    from ..train.state import restore_checkpoint

    with open(args.testlist) as f:
        testlist = [line.rstrip() for line in f if line.strip()]

    model = CascadeMVSNet(
        ndepths=tuple(int(x) for x in args.ndepths.split(",") if x),
        cr_base_chs=tuple(int(x) for x in args.cr_base_chs.split(",") if x),
        share_cr=args.share_cr,
        grad_method=args.grad_method,
        agg_mode=args.agg_mode,
        use_fmt=args.use_fmt,
        use_geo_fusion=not args.no_geo_fusion,
        refine=False,
        # the KERNEL_PARITY_r04-validated serving configuration: clamp
        # ADIA hypotheses into the input sweep range (binds only in the
        # blown-sigma regime) and size the banded windows from worst-case
        # full-sweep spans at full-res eval geometry, so the fused path
        # cannot drop taps and the per-batch XLA redo never triggers
        clamp_samples=True,
        sampler_opts={"depth_group": 16,
                      "stage2": {"band_rows": 24},
                      "stage3": {"band_rows": 49, "wb": 320}},
    )

    dataset_cls = find_dataset_def(args.dataset)
    conf = tuple(float(x) for x in args.conf.split(","))

    variables = None
    for scene in testlist:
        dataset = dataset_cls(args.testpath, [scene], "test", args.num_view,
                              args.numdepth, args.interval_scale,
                              max_h=args.max_h, max_w=args.max_w,
                              fix_res=args.fix_res)
        if variables is None:
            sample = dataset[0]
            import numpy as np
            batch = {k: (np.asarray(v)[None] if isinstance(v, np.ndarray)
                         else {kk: vv[None] for kk, vv in v.items()}
                         if isinstance(v, dict) else v)
                     for k, v in sample.items() if k != "filename"}
            variables = jax.jit(model.init, static_argnames=("train",))(
                jax.random.PRNGKey(0), batch["imgs"], batch["proj_matrices"],
                batch["depth_values"], batch["intrinsics_matrices"],
                train=False)
            if args.loadckpt:
                import orbax.checkpoint as ocp
                payload = ocp.PyTreeCheckpointer().restore(
                    os.path.abspath(args.loadckpt))
                variables = {"params": payload["params"],
                             "batch_stats": payload["batch_stats"]}
        runner = DepthRunner(model, variables)
        save_scene_depth(runner, dataset, args.outdir,
                         batch_size=args.batch_size)

    if args.filter_method == "dypcd":
        dypcd_filter(args.testpath, args.outdir, testlist, conf=conf,
                     dist_base=args.dist_base, rel_diff_base=args.rel_diff_base)
    elif args.filter_method == "pcd":
        pcd_filter(args.testpath, args.outdir, testlist, conf=conf,
                   thres_view=args.thres_view)
    elif args.filter_method == "consistency":
        from ..infer.fusion_tpu import consistency_filter
        consistency_filter(args.testpath, args.outdir, testlist, conf=conf)


if __name__ == "__main__":
    main()
