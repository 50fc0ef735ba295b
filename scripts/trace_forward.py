"""On-chip perfetto trace of the full forward, aggregated by op/source.

The axon TPU tunnel supports jax.profiler device traces — this is the
ground-truth per-fusion timing tool (the differential while-loop bench in
bench.py measures totals; this attributes them). Writes the raw trace
under --logdir and prints the top-K device ops aggregated by
(hlo_category, source line), plus a per-iteration total.

    timeout 1800 python scripts/trace_forward.py [--small] [--iters 3]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--logdir", default="/tmp/jaxtrace_fwd")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_damvsnet"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _example_batch
    from damvsnet_tpu.model import CascadeMVSNet

    h, w, nv = (256, 320, 3) if args.small else (864, 1152, 5)
    if os.environ.get("TRACE_SERVING"):
        # trace the SHIPPED serving configuration on the bench workload
        # (scene input, trained weights, two-tier windows, clamp)
        from bench import load_bench_weights
        from damvsnet_tpu.data.synthetic import make_synthetic_sample
        from damvsnet_tpu.infer.serving import serving_sampler_opts
        model = CascadeMVSNet(ndepths=(64, 32, 8),
                              compute_dtype=jnp.bfloat16,
                              clamp_samples=True,
                              sampler_opts=serving_sampler_opts())
        sample = make_synthetic_sample(height=h, width=w, nviews=nv,
                                       ndepths=192, with_gt=False, seed=3)
        batch = {
            "imgs": jnp.asarray(sample["imgs"][None]),
            "proj_matrices": {k: jnp.asarray(v[None])
                              for k, v in sample["proj_matrices"].items()},
            "depth_values": jnp.asarray(sample["depth_values"][None]),
            "intrinsics_matrices": {
                k: jnp.asarray(v[None])
                for k, v in sample["intrinsics_matrices"].items()},
        }
    else:
        model = CascadeMVSNet(ndepths=(64, 32, 8), compute_dtype=jnp.bfloat16)
        batch = _example_batch(batch=1, nviews=nv, height=h, width=w, d0=192)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch["imgs"], batch["proj_matrices"],
        batch["depth_values"], batch["intrinsics_matrices"], train=False)
    if os.environ.get("TRACE_SERVING"):
        from bench import load_bench_weights
        variables, loaded = load_bench_weights(variables)
        print("trained weights loaded:", loaded, flush=True)

    @jax.jit
    def fwd(v, imgs, proj, dvals, intr):
        return jnp.mean(model.apply(v, imgs, proj, dvals, intr,
                                    train=False)["depth"])

    a = (variables, batch["imgs"], batch["proj_matrices"],
         batch["depth_values"], batch["intrinsics_matrices"])
    print("warm:", float(fwd(*a)), flush=True)

    jax.profiler.start_trace(args.logdir)
    r = None
    for _ in range(args.iters):
        r = fwd(*a)
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
            continue  # the enclosing program row
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

    # per-op view: same-named ops summed across iters, top individuals
    by_op = collections.Counter()
    op_info = {}
    for e in dev:
        name = e["name"]
        if name.startswith("jit_"):
            continue
        by_op[name] += e["dur"]
        if name not in op_info:
            a = e.get("args", {})
            op_info[name] = (a.get("source", ""),
                             a.get("long_name", name)[:160])
    print("\n--- top individual ops ---")
    for name, d in by_op.most_common(args.top):
        src, long = op_info[name]
        if src.startswith("/root/repo/"):
            src = src[len("/root/repo/"):]
        print(f"{d / 1e3 / args.iters:9.2f} ms  {name}  [{src}]")
        print(f"           {long}")


if __name__ == "__main__":
    main()
