"""Benchmark: depth-maps/sec on the flagship cascade at DTU eval shape.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config matches the reference DTU evaluation (BASELINE.md): 1152x864 input,
N=5 views, ndepths=(64,32,8), adaptive aggregation + GeoFeatureFusion.
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
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    warmup = int(os.environ.get("BENCH_WARMUP", "2"))
    if os.environ.get("BENCH_SMALL"):
        height, width, nviews = 256, 320, 3
        iters = max(2, iters // 2)

    import jax
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _example_batch
    from damvsnet_tpu.model import CascadeMVSNet

    model = CascadeMVSNet(ndepths=(64, 32, 8))
    batch = _example_batch(batch=1, nviews=nviews, height=height, width=width,
                           d0=d0)
    variables = model.init(
        jax.random.PRNGKey(0), batch["imgs"], batch["proj_matrices"],
        batch["depth_values"], batch["intrinsics_matrices"], train=False)

    @jax.jit
    def forward(variables, imgs, proj, dvals, intr):
        out = model.apply(variables, imgs, proj, dvals, intr, train=False)
        return out["depth"], out["photometric_confidence"]

    args = (variables, batch["imgs"], batch["proj_matrices"],
            batch["depth_values"], batch["intrinsics_matrices"])
    for _ in range(warmup):
        d, c = forward(*args)
        d.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        d, c = forward(*args)
        d.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    maps_per_sec = 1.0 / dt

    print(json.dumps({
        "metric": f"depth_maps_per_sec_{width}x{height}_N{nviews}_D64-32-8",
        "value": round(maps_per_sec, 4),
        "unit": "depth-maps/sec/chip",
        "vs_baseline": round(maps_per_sec / A100_BASELINE_MAPS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
