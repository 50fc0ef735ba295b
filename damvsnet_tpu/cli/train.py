"""Training CLI.

Flag surface parity with /root/reference/train.py:19-77 (the subset that is
meaningful on TPU; NCCL/apex knobs are replaced by mesh flags).

    python -m damvsnet_tpu.cli.train --dataset dtu_yao \
        --trainpath ... --trainlist lists/dtu/train.txt \
        --testpath ... --testlist lists/dtu/val.txt \
        --logdir ./checkpoints --epochs 16 --batch_size 4
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def build_parser():
    p = argparse.ArgumentParser("damvsnet-tpu train")
    p.add_argument("--mode", default="train", choices=["train", "test", "profile"])
    p.add_argument("--model", default="mvsnet")
    p.add_argument("--dataset", default="dtu_yao")
    p.add_argument("--trainpath", default=None)
    p.add_argument("--testpath", default=None)
    p.add_argument("--trainlist", default=None)
    p.add_argument("--testlist", default=None)
    p.add_argument("--epochs", type=int, default=16)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--lrepochs", default="10,12,14:2")
    p.add_argument("--wd", type=float, default=0.0)
    p.add_argument("--nviews", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--numdepth", type=int, default=192)
    p.add_argument("--interval_scale", type=float, default=1.06)
    p.add_argument("--summary_freq", type=int, default=50)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--logdir", default="./checkpoints")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--loadckpt", default=None)
    # model config (parity: ndepths "64,32,8" etc.)
    p.add_argument("--ndepths", default="64,32,8")
    p.add_argument("--depth_inter_r", default="4,2,1")
    p.add_argument("--cr_base_chs", default="8,8,8")
    p.add_argument("--dlossw", default="0.5,1.0,2.0")
    p.add_argument("--share_cr", action="store_true")
    p.add_argument("--grad_method", default="detach", choices=["detach", "undetach"])
    p.add_argument("--agg_mode", default="adaptive", choices=["adaptive", "variance"])
    p.add_argument("--use_fmt", action="store_true")
    p.add_argument("--no_geo_fusion", action="store_true")
    p.add_argument("--no_cpc", action="store_true")
    # TPU runtime
    p.add_argument("--mesh_data", type=int, default=None,
                   help="data-parallel mesh size (default: all devices)")
    p.add_argument("--mesh_space", type=int, default=1,
                   help="'space' mesh axis size for depth-slab sharding "
                        "of the cost volumes (enables --slab_axis space)")
    p.add_argument("--dtype", default="auto", choices=["auto", "bf16", "f32"],
                   help="compute dtype: auto = bf16 on TPU, f32 elsewhere "
                        "(f32 = reference-parity precision)")
    p.add_argument("--fused_train", action="store_true",
                   help="run the fused Pallas cost volume in the train "
                        "step via its custom VJP (the benchmarked 5.2x "
                        "step speedup, BENCH_TRAIN; AggWeightNet BNs use "
                        "running stats while enabled)")
    p.add_argument("--cache_dir", default="~/.cache/jax_damvsnet",
                   help="persistent XLA compilation cache ('' disables)")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--grad_accum", type=int, default=1)
    p.add_argument("--save_freq", type=int, default=0,
                   help="preemption-safe step checkpointing: save an "
                        "async mid-epoch checkpoint (with the data "
                        "cursor) every N steps; --resume restores it and "
                        "continues mid-epoch. 0 = per-epoch only "
                        "(reference parity, train.py:130-137)")
    p.add_argument("--profile_dir", default=None,
                   help="write a JAX profiler trace here for steps 2-6")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (the TPU-side analog of "
                        "torch detect_anomaly)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax
    import numpy as np
    import optax

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if args.cache_dir:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser(args.cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ..data import find_dataset_def
    from ..data.common import DataLoader
    from ..model import CascadeMVSNet
    from ..parallel import make_mesh, shard_batch, maybe_initialize_distributed
    from ..train.loop import Trainer
    from ..train.profiler import trace_steps
    from ..train.schedule import make_optimizer
    from ..train.state import (create_train_state, latest_checkpoint,
                               restore_checkpoint)

    ndepths = tuple(int(x) for x in args.ndepths.split(",") if x)
    dlossw = tuple(float(x) for x in args.dlossw.split(",") if x)

    import jax.numpy as jnp
    if args.dtype == "auto":
        dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                 else jnp.float32)
    else:
        dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[args.dtype]

    model = CascadeMVSNet(
        ndepths=ndepths,
        depth_intervals_ratio=tuple(float(x) for x in args.depth_inter_r.split(",") if x),
        cr_base_chs=tuple(int(x) for x in args.cr_base_chs.split(",") if x),
        share_cr=args.share_cr,
        grad_method=args.grad_method,
        agg_mode=args.agg_mode,
        use_fmt=args.use_fmt,
        use_geo_fusion=not args.no_geo_fusion,
        compute_dtype=dtype,
        fused_train=args.fused_train,
        sampler_opts={"depth_group": 16} if args.fused_train else None,
        clamp_samples=args.fused_train,  # bound the banded windows (the
        # fused train step has no per-batch XLA redo on overflow)
        slab_axis="space" if args.mesh_space > 1 else None,
    )

    dataset_cls = find_dataset_def(args.dataset)
    train_dataset = dataset_cls(args.trainpath, args.trainlist, "train",
                                args.nviews, args.numdepth, args.interval_scale)
    val_dataset = dataset_cls(args.testpath or args.trainpath,
                              args.testlist or args.trainlist, "val",
                              args.nviews, args.numdepth, args.interval_scale) \
        if args.testlist else None

    train_loader = DataLoader(train_dataset, args.batch_size, shuffle=True,
                              seed=args.seed, num_workers=args.num_workers)
    iters_per_epoch = len(train_loader)
    tx, _ = make_optimizer(args.lr, args.lrepochs, iters_per_epoch, args.wd)

    example = next(iter(DataLoader(train_dataset, args.batch_size,
                                   num_workers=0)))
    state = create_train_state(model, jax.random.PRNGKey(args.seed), example, tx)

    os.makedirs(args.logdir, exist_ok=True)
    skip_batches = 0
    if args.resume:
        ckpt = latest_checkpoint(args.logdir)
        if ckpt:
            state, skip_batches = restore_checkpoint(ckpt, state,
                                                     with_cursor=True)
            print(f"resumed from {ckpt} at epoch {state.epoch}"
                  + (f" (mid-epoch, skipping {skip_batches} batches)"
                     if skip_batches else ""))
    elif args.loadckpt:
        state = restore_checkpoint(args.loadckpt, state, weights_only=True)
        print(f"loaded weights from {args.loadckpt}")

    maybe_initialize_distributed()
    mesh = make_mesh(data=args.mesh_data
                     or len(jax.devices()) // args.mesh_space,
                     space=args.mesh_space)
    trainer = Trainer(model, state, args.logdir, dlossw=dlossw,
                      use_cpc=not args.no_cpc, summary_freq=args.summary_freq,
                      save_freq=args.save_freq)
    if args.grad_accum > 1:
        from ..train.loop import make_train_step
        trainer.train_step = make_train_step(
            model, dlossw, not args.no_cpc, grad_accum=args.grad_accum)

    if args.profile_dir:
        # profile a few warm steps (parity intent: train.py:344-372)
        batches = iter(train_loader)
        warm = shard_batch(mesh, next(batches))
        with mesh:
            trainer.state, _ = trainer.train_step(trainer.state, warm)
            with trace_steps(args.profile_dir):
                for _ in range(5):
                    trainer.state, _ = trainer.train_step(trainer.state, warm)
        print(f"profiler trace written to {args.profile_dir}")

    with mesh:
        for epoch in range(state.epoch, args.epochs):
            t0 = time.time()
            means = trainer.train_epoch(
                (shard_batch(mesh, b) for b in train_loader),
                skip_batches=skip_batches)
            skip_batches = 0
            print(f"epoch {epoch} done in {time.time() - t0:.1f}s: "
                  + " ".join(f"{k}={v:.4f}" for k, v in means.items()))
            if val_dataset is not None:
                val_loader = DataLoader(val_dataset, args.batch_size,
                                        num_workers=args.num_workers)
                trainer.eval_epoch(shard_batch(mesh, b) for b in val_loader)


if __name__ == "__main__":
    main()
