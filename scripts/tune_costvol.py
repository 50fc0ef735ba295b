"""On-chip parameter sweep for the fused cost-volume kernel.

Times ops/pallas/fused_costvol.py per cascade stage at DTU eval geometry
over (depth_group, wb, band_rows) combinations, reporting ms and the
overflow flag (overflow => dropped taps => the config is invalid for that
geometry and the runner would fall back to XLA). Use to pick the
sampler_opts defaults.

    timeout 3600 python scripts/tune_costvol.py
"""
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_damvsnet"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _example_batch
    from damvsnet_tpu.model.cascade import fuse_projection_matrices
    from damvsnet_tpu.ops.pallas.fused_costvol import fused_adaptive_cost_volume

    small = bool(os.environ.get("TUNE_SMALL"))
    H, W, NV = (256, 320, 3) if small else (864, 1152, 5)
    D = (64, 32, 8)
    FC = (32, 16, 8)
    rs = np.random.default_rng(0)
    batch = _example_batch(batch=1, nviews=NV, height=H, width=W, d0=192)
    proj_full = {k: np.asarray(v) for k, v in batch["proj_matrices"].items()}
    # the rig's REAL sweep range — a mismatched range projects off-screen
    # and makes the overflow flag meaningless
    dv_all = np.asarray(batch["depth_values"])[0]
    dmin, dmax = float(dv_all[0]), float(dv_all[-1])

    # r5 sweep: the r4 single-window serving config per stage vs two-tier
    # adaptive band sizing (wide tier = the rig's full-sweep worst case
    # from scripts/compute_windows.py; narrow tier swept). ADIA-narrowed
    # stage-2/3 ranges mean most cells fit the narrow tier.
    # r5 post-fix sweep: the shipped serving-C tiers vs xblk=64 variants
    # (halving the output tile roughly halves the tile-span term of the
    # narrow wb at 2x grid steps — PERF.md round-5 "next-round levers").
    combos_per_stage = {
        0: [
            dict(depth_group=16, wb=168, band_rows=17),       # serving C
            dict(depth_group=16, wb=104, band_rows=17, xblk=64),
            dict(depth_group=16, wb=120, band_rows=17, xblk=64),
            dict(depth_group=32, wb=104, band_rows=17, xblk=64),
        ],
        1: [
            dict(depth_group=16, wb=224, band_rows=32, two_tier=True,
                 narrow_wb=176, narrow_band_rows=16),          # serving C
            dict(depth_group=16, wb=224, band_rows=32, two_tier=True,
                 narrow_wb=112, narrow_band_rows=16, xblk=64),
            dict(depth_group=16, wb=136, band_rows=32, xblk=64),
        ],
        2: [
            dict(depth_group=16, wb=320, band_rows=56, two_tier=True,
                 narrow_wb=200, narrow_band_rows=26),          # serving C
            dict(depth_group=16, wb=320, band_rows=56, two_tier=True,
                 narrow_wb=136, narrow_band_rows=26, xblk=64),
            dict(depth_group=16, wb=200, band_rows=56, xblk=64),
        ],
    }

    results = []
    for sidx in range(3):
        scale = 2 ** (2 - sidx)
        h, w, c, d = H // scale, W // scale, FC[sidx], D[sidx]
        fused_p = fuse_projection_matrices(
            jnp.asarray(proj_full[f"stage{sidx + 1}"]))
        ref_proj = fused_p[:, 0]
        src_projs = [fused_p[:, i] for i in range(1, NV)]
        ref = jnp.asarray(rs.random((1, h, w, c), np.float32), jnp.bfloat16)
        srcs = [jnp.asarray(rs.random((1, h, w, c), np.float32), jnp.bfloat16)
                for _ in range(NV - 1)]
        # stage ranges mimic the cascade: full sweep at stage 1, ADIA-
        # narrowed (x4 / x16) around the midpoint at stages 2/3
        span = (dmax - dmin) / (4 ** sidx)
        mid = 0.5 * (dmin + dmax)
        dv = jnp.asarray(np.broadcast_to(
            np.linspace(mid - span / 2, mid + span / 2, d,
                        dtype=np.float32)[None, :, None, None],
            (1, d, h, w)).copy())
        w1 = jnp.asarray(rs.random(c, np.float32))

        for cfg in combos_per_stage[sidx]:
            def run(ref, srcs, dv, w1, i, cfg=cfg, ref_proj=ref_proj,
                    src_projs=src_projs):
                vol, of = fused_adaptive_cost_volume(
                    ref + i.astype(ref.dtype) * 1e-6, srcs, ref_proj,
                    src_projs, dv, w1, 0.1, 1.0, 0.0, **cfg)
                return jnp.mean(vol.astype(jnp.float32)) + of[0, 0] * 0.0

            def run_of(cfg=cfg):
                _, of = fused_adaptive_cost_volume(
                    ref, srcs, ref_proj, src_projs, dv, w1, 0.1, 1.0, 0.0,
                    **cfg)
                return int(jax.device_get(of)[0, 0])

            try:
                @jax.jit
                def loop(args, iters):
                    def body(c2):
                        i, acc = c2
                        return i + 1, acc + run(*args, i)
                    return jax.lax.while_loop(
                        lambda c2: c2[0] < iters, body,
                        (jnp.int32(0), jnp.float32(0.0)))[1]

                a = (ref, srcs, dv, w1)
                float(loop(a, jnp.int32(1)))
                t0 = time.perf_counter()
                float(loop(a, jnp.int32(2)))
                ts = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(loop(a, jnp.int32(10)))
                tl = time.perf_counter() - t0
                ms = (tl - ts) / 8 * 1e3
                row = dict(stage=sidx + 1, **cfg, ms=round(ms, 2),
                           overflow=run_of())
            except Exception as e:
                row = dict(stage=sidx + 1, **cfg,
                           error=f"{type(e).__name__}: {e}"[:160])
            results.append(row)
            print(json.dumps(row), flush=True)

    with open("/tmp/tune_costvol.json", "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
