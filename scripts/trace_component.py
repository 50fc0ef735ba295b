"""Perfetto trace of ONE isolated component (default: CostRegNet stage2,
the 104-ms whale in PERF_STAGES_r03.json) — compiles in seconds, unlike
the full forward, so the perf loop can iterate on chip.

    timeout 900 python scripts/trace_component.py [--comp costreg2]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--comp", default="costreg2",
                    help="costreg1|costreg2|costreg3|geofusion3|featurenet")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--depth_block", type=int, default=16)
    ap.add_argument("--logdir", default="/tmp/jaxtrace_comp")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_damvsnet"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from damvsnet_tpu.nn.precision import compute_dtype as cdt_scope

    H, W = 864, 1152
    bf16 = jnp.bfloat16
    rs = np.random.default_rng(0)

    if args.comp.startswith("costreg"):
        from damvsnet_tpu.nn.costreg import CostRegNet
        sidx = int(args.comp[-1]) - 1
        scale = 2 ** (2 - sidx)
        h, w, c, d = H // scale, W // scale, (32, 16, 8)[sidx], (64, 32, 8)[sidx]
        mod = CostRegNet(base_channels=8, depth_block=args.depth_block)
        x = jnp.asarray(rs.random((1, d, h, w, c), np.float32), bf16)

        def init():
            with cdt_scope(bf16):
                return mod.init(jax.random.PRNGKey(0), x, False)

        def run(v, x):
            with cdt_scope(bf16):
                return jnp.mean(mod.apply(v, x, False).astype(jnp.float32))
    elif args.comp == "geofusion3":
        from damvsnet_tpu.nn.geofusion import GeoFeatureFusion
        mod = GeoFeatureFusion(convolutional_layer_encoding="z",
                               mask_type="basic", add_origin_feat_flag=True)
        dvals0 = jnp.asarray(np.linspace(4.0, 8.0, 192, np.float32)[None])
        rgb = jnp.asarray(rs.random((1, H, W, 3), np.float32))
        dep = jnp.asarray(5 + rs.random((1, H, W, 1), np.float32))
        conf = jnp.asarray(rs.random((1, H, W, 1), np.float32))
        orig = jnp.asarray(rs.random((1, H, W, 8), np.float32), bf16)
        x = (rgb, dep, conf, orig)

        def init():
            with cdt_scope(bf16):
                return mod.init(jax.random.PRNGKey(0), rgb, dep, conf,
                                dvals0, 2, orig, None, False)

        def run(v, x):
            rgb, dep, conf, orig = x
            with cdt_scope(bf16):
                return jnp.mean(mod.apply(v, rgb, dep, conf, dvals0, 2,
                                          orig, None, False
                                          ).astype(jnp.float32))
    elif args.comp == "fmt":
        # FMTWithPathway at eval stage-1 geometry, all 5 views (ref +
        # 4 src): the cost of enabling use_fmt=True on the flagship rig
        from damvsnet_tpu.nn.fmt import FMTWithPathway
        mod = FMTWithPathway(base_channels=8)
        feats = []
        for v in range(5):
            feats.append({
                "stage1": jnp.asarray(
                    rs.random((1, H // 4, W // 4, 32), np.float32), bf16),
                "stage2": jnp.asarray(
                    rs.random((1, H // 2, W // 2, 16), np.float32), bf16),
                "stage3": jnp.asarray(
                    rs.random((1, H, W, 8), np.float32), bf16),
            })
        x = feats

        def init():
            with cdt_scope(bf16):
                return mod.init(jax.random.PRNGKey(0), feats)

        def run(v, x):
            with cdt_scope(bf16):
                out = mod.apply(v, x)
            return jnp.mean(out[-1]["stage3"].astype(jnp.float32))
    elif args.comp == "featurenet":
        from damvsnet_tpu.nn.feature import FeatureNet
        mod = FeatureNet(base_channels=8, num_stage=3, arch_mode="fpn")
        x = jnp.asarray(rs.random((1, H, W, 3), np.float32))

        def init():
            with cdt_scope(bf16):
                return mod.init(jax.random.PRNGKey(0), x, False)

        def run(v, x):
            with cdt_scope(bf16):
                return jnp.mean(mod.apply(v, x, False
                                          )["stage3"].astype(jnp.float32))
    else:
        raise SystemExit(f"unknown comp {args.comp}")

    v = jax.jit(init)()
    f = jax.jit(run)
    print("warm:", float(f(v, x)), flush=True)

    jax.profiler.start_trace(args.logdir)
    r = None
    for _ in range(args.iters):
        r = f(v, x)
    float(r)
    jax.profiler.stop_trace()

    path = sorted(glob.glob(os.path.join(
        args.logdir, "plugins/profile/*/*.trace.json.gz")))[-1]
    with gzip.open(path) as fh:
        data = json.load(fh)
    ev = data["traceEvents"] if isinstance(data, dict) else data
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = [e for e in ev if e.get("ph") == "X" and "dur" in e
           and "TPU" in pids.get(e.get("pid"), "")]

    total = 0.0
    by_key = collections.Counter()
    sample = {}
    for e in dev:
        name = e["name"]
        if name.startswith("jit_"):
            continue
        aargs = e.get("args", {})
        cat = aargs.get("hlo_category", "?")
        src = aargs.get("source", "")
        if src.startswith("/root/repo/"):
            src = src[len("/root/repo/"):]
        key = (cat, src or name.split(".")[0])
        by_key[key] += e["dur"]
        total += e["dur"]
        if key not in sample:
            sample[key] = aargs.get("long_name", name)[:140]
    print(f"\ndevice total: {total / 1e3 / args.iters:.1f} ms/iter "
          f"({len(dev)} events, {args.iters} iters)")
    for (cat, src), d in by_key.most_common(args.top):
        print(f"{d / 1e3 / args.iters:9.2f} ms  [{cat}] {src}")
        print(f"           e.g. {sample[(cat, src)]}")


if __name__ == "__main__":
    main()
