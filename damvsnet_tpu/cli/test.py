"""Inference + fusion CLI.

Parity with /root/reference/test_uni.py:95-117,504-533: run per-scene depth
inference, then dispatch filter_method in {pcd, dypcd, consistency}.

    python -m damvsnet_tpu.cli.test --dataset general_eval \
        --testpath ... --testlist lists/dtu/test.txt --loadckpt ... \
        --outdir ./outputs --filter_method dypcd

TPU-native deltas from the reference driver:
  * one DepthRunner reused across scenes (one jit compile per input
    shape, not per scene — the reference reconstructs DataParallel per
    scene, test_uni.py:215-227) + persistent XLA compilation cache;
  * bf16 compute by default on TPU (--dtype f32 restores the reference's
    precision) — the benchmarked serving configuration, not a debug path;
  * scan-parallel inference across hosts: under a multi-process
    jax.distributed launch each process takes testlist[i::n]
    (SURVEY §2.7; replaces the reference's serial scene loop,
    test_uni.py:203-204).
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
    # serving configuration (defaults = the benchmarked fast path)
    p.add_argument("--dtype", default="auto", choices=["auto", "bf16", "f32"],
                   help="compute dtype: auto = bf16 on TPU, f32 elsewhere")
    p.add_argument("--no_clamp_samples", action="store_true",
                   help="disable the ADIA hypothesis clamp (reference-"
                        "parity sampling; the banded sampler may then "
                        "overflow and redo batches with the XLA path)")
    p.add_argument("--sampler", default="auto",
                   choices=["auto", "pallas", "xla"])
    p.add_argument("--sampler_windows", default="dtu",
                   choices=["dtu", "single", "default"],
                   help="banded-kernel window budgets: 'dtu' = the "
                        "KERNEL_PARITY-validated two-tier serving config "
                        "for full-res DTU eval (infer/serving.py); "
                        "'single' = the r4 single-window config; "
                        "'default' = model defaults")
    p.add_argument("--cache_dir", default="~/.cache/jax_damvsnet",
                   help="persistent XLA compilation cache ('' disables)")
    # fusion
    p.add_argument("--filter_method", default="dypcd",
                   choices=["pcd", "dypcd", "consistency", "none"])
    p.add_argument("--conf", default="0.1,0.15,0.9")
    p.add_argument("--thres_view", type=int, default=5)
    p.add_argument("--dist_base", type=float, default=0.25)
    p.add_argument("--rel_diff_base", type=float, default=1.0 / 1300)
    p.add_argument("--num_consistent", type=int, default=None,
                   help="consistency filter: fixed gipuma-style vote "
                        "threshold instead of the dynamic dypcd vote")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cache_dir:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser(args.cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ..data import find_dataset_def
    from ..model import CascadeMVSNet
    from ..infer.runner import DepthRunner, save_scene_depth
    from ..infer.fusion_dypcd import dypcd_filter
    from ..infer.fusion_pcd import pcd_filter
    from ..parallel import maybe_initialize_distributed, shard_work_items

    process_index, process_count = maybe_initialize_distributed()

    with open(args.testlist) as f:
        testlist = [line.rstrip() for line in f if line.strip()]
    # scan-parallel inference: each host/process takes a disjoint slice of
    # the (scene) work items; outputs land in the shared outdir
    my_scenes = shard_work_items(testlist, process_index, process_count)
    if process_count > 1:
        print(f"process {process_index}/{process_count}: "
              f"{len(my_scenes)}/{len(testlist)} scenes")

    if args.dtype == "auto":
        dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                 else jnp.float32)
    else:
        dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[args.dtype]

    from ..infer.serving import serving_sampler_opts
    if args.sampler_windows == "default":
        sampler_opts = {"depth_group": 16}
    else:
        sampler_opts = serving_sampler_opts(
            two_tier=args.sampler_windows == "dtu")

    model = CascadeMVSNet(
        ndepths=tuple(int(x) for x in args.ndepths.split(",") if x),
        cr_base_chs=tuple(int(x) for x in args.cr_base_chs.split(",") if x),
        share_cr=args.share_cr,
        grad_method=args.grad_method,
        agg_mode=args.agg_mode,
        use_fmt=args.use_fmt,
        use_geo_fusion=not args.no_geo_fusion,
        refine=False,
        compute_dtype=dtype,
        sampler=args.sampler,
        clamp_samples=not args.no_clamp_samples,
        sampler_opts=sampler_opts,
    )

    dataset_cls = find_dataset_def(args.dataset)
    conf = tuple(float(x) for x in args.conf.split(","))

    # ONE runner for every scene: jit caches per input shape, so scenes
    # sharing a resolution share a single compile (the reference pays a
    # fresh DataParallel + graph per scene, test_uni.py:215-227)
    runner = None
    for scene in my_scenes:
        dataset = dataset_cls(args.testpath, [scene], "test", args.num_view,
                              args.numdepth, args.interval_scale,
                              max_h=args.max_h, max_w=args.max_w,
                              fix_res=args.fix_res)
        if runner is None:
            sample = dataset[0]
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
        dypcd_filter(args.testpath, args.outdir, my_scenes, conf=conf,
                     dist_base=args.dist_base, rel_diff_base=args.rel_diff_base)
    elif args.filter_method == "pcd":
        pcd_filter(args.testpath, args.outdir, my_scenes, conf=conf,
                   thres_view=args.thres_view)
    elif args.filter_method == "consistency":
        from ..infer.fusion_tpu import consistency_filter
        consistency_filter(args.testpath, args.outdir, my_scenes, conf=conf,
                           dist_base=args.dist_base,
                           rel_diff_base=args.rel_diff_base,
                           num_consistent=args.num_consistent)


if __name__ == "__main__":
    main()
