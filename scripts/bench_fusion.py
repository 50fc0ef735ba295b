"""Fusion backend throughput at the full DTU rig (1152x864, 5 views).

Times the three dypcd-consistency fusion backends over the SAME scene
(synthetic full-rig depth maps: GT + noise, DTU-like confidence):

  * numpy     — the reference-shaped host path (filter/dypcd.py parity)
  * native    — the fused C++ pass (native/fusion.cpp via ctypes)
  * tpu       — device-batched consistency (infer/fusion_tpu.py), the
                fusibile-replacement engine; reported with compile time
                separated (first scene compiles, steady state reuses)

The 'fusibile replacement' claim needs a number (VERDICT r4 weak #4) —
this writes FUSION_BENCH_r05.json.

    timeout 4000 python scripts/bench_fusion.py
"""
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_tree(work, scan, height, width, nviews):
    from damvsnet_tpu.core.pfm import read_pfm, write_pfm
    from damvsnet_tpu.data.synthetic import export_synthetic_scene

    datadir = os.path.join(work, "data")
    outdir = os.path.join(work, "outputs")
    export_synthetic_scene(datadir, scan, height=height, width=width,
                           nviews=nviews, seed=77)
    sdir = os.path.join(outdir, scan)
    os.makedirs(os.path.join(sdir, "depth_est"), exist_ok=True)
    os.makedirs(os.path.join(sdir, "confidence"), exist_ok=True)
    shutil.copytree(os.path.join(datadir, scan, "cams"),
                    os.path.join(sdir, "cams"))
    shutil.copytree(os.path.join(datadir, scan, "images"),
                    os.path.join(sdir, "images"))
    rs = np.random.default_rng(5)
    for v in range(nviews):
        gt, _ = read_pfm(os.path.join(datadir, scan,
                                      f"gt_depths/{v:08d}.pfm"))
        noise = 0.002 * gt.std() * rs.standard_normal(gt.shape)
        est = (gt + noise).astype(np.float32)
        write_pfm(os.path.join(sdir, f"depth_est/{v:08d}.pfm"), est)
        conf = (0.8 + 0.2 * rs.random(gt.shape)).astype(np.float32)
        write_pfm(os.path.join(sdir, f"confidence/{v:08d}.pfm"), conf)
        write_pfm(os.path.join(sdir, f"confidence/{v:08d}_stage2.pfm"), conf)
        write_pfm(os.path.join(sdir, f"confidence/{v:08d}_stage1.pfm"), conf)
    return datadir, outdir


def main():
    import tempfile

    from damvsnet_tpu.core.ply import read_ply
    from damvsnet_tpu.infer.fusion_dypcd import filter_depth_dypcd
    from damvsnet_tpu.infer.fusion_tpu import consistency_filter

    height, width, nviews = 864, 1152, 5
    scan = "fusion_bench"
    work = tempfile.mkdtemp(prefix="fusion_bench_")
    datadir, outdir = build_tree(work, scan, height, width, nviews)
    pair_folder = os.path.join(datadir, scan)
    scan_folder = os.path.join(outdir, scan)
    conf = (0.1, 0.15, 0.5)

    report = {"config": {"H": height, "W": width, "nviews": nviews},
              "backends": {}}

    for name, use_native in (("numpy", False), ("native_cpp", True)):
        ply = os.path.join(work, f"{name}.ply")
        t0 = time.perf_counter()
        filter_depth_dypcd(pair_folder, scan_folder, scan_folder, ply,
                           conf=conf, use_native=use_native,
                           log_fn=lambda *_: None)
        dt = time.perf_counter() - t0
        pts, _ = read_ply(ply)
        report["backends"][name] = {"scene_sec": round(dt, 3),
                                    "points": int(len(pts))}
        print(name, report["backends"][name], flush=True)

    # TPU backend: first call includes jit compile; second call (fresh
    # outputs, same shapes) is the steady state every later scene pays
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_damvsnet"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    for attempt in ("cold", "steady"):
        ply = os.path.join(outdir, f"{scan}.ply")
        if os.path.exists(ply):
            os.remove(ply)
        t0 = time.perf_counter()
        consistency_filter(datadir, outdir, [scan], conf=conf,
                           log_fn=lambda *_: None)
        dt = time.perf_counter() - t0
        pts, _ = read_ply(ply)
        report["backends"][f"tpu_{attempt}"] = {"scene_sec": round(dt, 3),
                                                "points": int(len(pts))}
        print(f"tpu_{attempt}", report["backends"][f"tpu_{attempt}"],
              flush=True)
    report["device"] = str(jax.devices()[0])

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "FUSION_BENCH_r05.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
