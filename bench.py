"""Benchmark: depth-maps/sec on the flagship cascade at DTU eval shape.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config matches the reference DTU evaluation (BASELINE.md): 1152x864 input,
N=5 views, ndepths=(64,32,8), adaptive aggregation + GeoFeatureFusion,
bf16 compute (fp32 softmax/regression tail).

Timing methodology: on this host the TPU is attached through a remote
tunnel where `block_until_ready` does not actually block and host<->device
transfers run at ~20 MB/s — so the iteration loop runs *inside* one XLA
program (lax.fori_loop, inputs perturbed per step to prevent loop-invariant
hoisting) and only a scalar is fetched. Per-iteration time is the
difference between a long and a short run, cancelling the constant
dispatch/fetch overhead.

The reference repo publishes no throughput; vs_baseline is measured against
a nominal 3.0 depth-maps/s A100-class PyTorch figure for this model family
(BASELINE.md "north star": >= 5x that).
"""
import json
import os
import sys
import time

import numpy as np

A100_BASELINE_MAPS_PER_SEC = 3.0


def main():
    height, width, nviews, d0 = 864, 1152, 5, 192
    iters_long = int(os.environ.get("BENCH_ITERS", "16"))
    iters_short = max(1, iters_long // 8)
    if os.environ.get("BENCH_SMALL"):
        height, width, nviews = 256, 320, 3

    import jax
    import jax.numpy as jnp
    from functools import partial
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _example_batch
    from damvsnet_tpu.model import CascadeMVSNet

    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[
        os.environ.get("BENCH_DTYPE", "bf16")]
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_damvsnet"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    model = CascadeMVSNet(ndepths=(64, 32, 8), compute_dtype=dtype)
    batch = _example_batch(batch=1, nviews=nviews, height=height, width=width,
                           d0=d0)
    # jitted init: eager flax init is thousands of tiny dispatches — fatal
    # over the remote TPU tunnel
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch["imgs"], batch["proj_matrices"],
        batch["depth_values"], batch["intrinsics_matrices"], train=False)

    @jax.jit
    def bench_loop(variables, imgs, proj, dvals, intr, iters):
        # dynamic trip count => ONE compiled program for both run lengths
        def cond(carry):
            i, acc = carry
            return i < iters

        def body(carry):
            i, acc = carry
            # per-step input perturbation prevents loop-invariant hoisting
            out = model.apply(
                variables, imgs + (i.astype(imgs.dtype) * 1e-6), proj,
                dvals, intr, train=False)
            return i + 1, acc + jnp.mean(out["depth"])

        return jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(0.0)))[1]

    args = (variables, batch["imgs"], batch["proj_matrices"],
            batch["depth_values"], batch["intrinsics_matrices"])

    float(bench_loop(*args, jnp.int32(1)))  # compile + warm

    t0 = time.perf_counter()
    float(bench_loop(*args, jnp.int32(iters_short)))
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(bench_loop(*args, jnp.int32(iters_long)))
    t_long = time.perf_counter() - t0

    dt = (t_long - t_short) / (iters_long - iters_short)
    maps_per_sec = 1.0 / dt

    print(json.dumps({
        "metric": f"depth_maps_per_sec_{width}x{height}_N{nviews}_D64-32-8",
        "value": round(maps_per_sec, 4),
        "unit": "depth-maps/sec/chip",
        "vs_baseline": round(maps_per_sec / A100_BASELINE_MAPS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
