"""Per-stage on-chip timing of the cascade's components (VERDICT r2 item 1).

Times each hot component in isolation at the DTU eval geometry
(1152x864, N=5, D=(64,32,8), bf16) using the same differential
lax.while_loop methodology as bench.py (the TPU tunnel makes
block_until_ready unreliable; only scalars are fetched).

Emits one JSON line per component and writes the full table to
PERF_STAGES_r03.json. Run on the real chip:

    timeout 5400 python scripts/profile_stages.py

Set PROF_SMALL=1 for a quick CPU/small-shape smoke run.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = []


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_damvsnet"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _example_batch
    from damvsnet_tpu.model import CascadeMVSNet
    from damvsnet_tpu.model.cascade import fuse_projection_matrices
    from damvsnet_tpu.nn.precision import compute_dtype as cdt_scope

    small = bool(os.environ.get("PROF_SMALL"))
    H, W, NV = (256, 320, 3) if small else (864, 1152, 5)
    D = (64, 32, 8)
    FC = (32, 16, 8)  # feature channels per stage
    bf16 = jnp.bfloat16
    rs = np.random.default_rng(0)

    def timed(name, fn, args, iters_long=32, iters_short=4, flop=None):
        """Differential while-loop timing; fn(*args, i) -> scalar-able."""
        try:
            @jax.jit
            def loop(args, iters):
                def cond(c):
                    return c[0] < iters

                def body(c):
                    i, acc = c
                    return i + 1, acc + fn(*args, i)

                return jax.lax.while_loop(
                    cond, body, (jnp.int32(0), jnp.float32(0.0)))[1]

            t0 = time.perf_counter()
            float(loop(args, jnp.int32(1)))
            t_compile = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(loop(args, jnp.int32(iters_short)))
            t_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(loop(args, jnp.int32(iters_long)))
            t_l = time.perf_counter() - t0
            ms = (t_l - t_s) / (iters_long - iters_short) * 1e3
            row = {"name": name, "ms": round(ms, 3),
                   "compile_s": round(t_compile, 1)}
            if flop:
                row["gflop"] = round(flop / 1e9, 1)
                row["tflops"] = round(flop / (ms * 1e-3) / 1e12, 1)
        except Exception as e:  # keep profiling the rest
            row = {"name": name, "error": f"{type(e).__name__}: {e}"[:300]}
        RESULTS.append(row)
        print(json.dumps(row), flush=True)
        return row

    # ---------------- full forward (anchor) ----------------
    model = CascadeMVSNet(ndepths=D, compute_dtype=bf16)
    batch = _example_batch(batch=1, nviews=NV, height=H, width=W, d0=192)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch["imgs"], batch["proj_matrices"],
        batch["depth_values"], batch["intrinsics_matrices"], train=False)

    def fwd(variables, imgs, proj, dvals, intr, i):
        out = model.apply(variables, imgs + i.astype(imgs.dtype) * 1e-6, proj,
                          dvals, intr, train=False)
        return jnp.mean(out["depth"])

    timed("full_forward", fwd,
          (variables, batch["imgs"], batch["proj_matrices"],
           batch["depth_values"], batch["intrinsics_matrices"]),
          iters_long=16, iters_short=2)

    # ---------------- FeatureNet (x1 view) ----------------
    from damvsnet_tpu.nn.feature import FeatureNet
    feat = FeatureNet(base_channels=8, num_stage=3, arch_mode="fpn")
    img = jnp.asarray(rs.random((1, H, W, 3), np.float32))

    def feat_init():
        with cdt_scope(bf16):
            return feat.init(jax.random.PRNGKey(0), img, False)
    fvars = jax.jit(feat_init)()

    def feat_fwd(fvars, img, i):
        with cdt_scope(bf16):
            out = feat.apply(fvars, img + i.astype(img.dtype) * 1e-6, False)
        return jnp.mean(out["stage3"].astype(jnp.float32))

    timed("featurenet_1view", feat_fwd, (fvars, img))

    # ---------------- GeoFeatureFusion stages 2, 3 ----------------
    from damvsnet_tpu.nn.geofusion import GeoFeatureFusion
    geo = GeoFeatureFusion(convolutional_layer_encoding="z",
                           mask_type="basic", add_origin_feat_flag=True)
    dvals0 = jnp.asarray(
        np.linspace(4.0, 8.0, 192, dtype=np.float32)[None])
    for sidx, scale, c in ((1, 2, 16), (2, 1, 8)):
        h, w = H // scale, W // scale
        rgb = jnp.asarray(rs.random((1, h, w, 3), np.float32))
        dep = jnp.asarray(5 + rs.random((1, h, w, 1), np.float32))
        conf = jnp.asarray(rs.random((1, h, w, 1), np.float32))
        orig = jnp.asarray(rs.random((1, h, w, c), np.float32), bf16)

        def geo_init(rgb=rgb, dep=dep, conf=conf, orig=orig, sidx=sidx):
            with cdt_scope(bf16):
                return geo.init(jax.random.PRNGKey(0), rgb, dep, conf,
                                dvals0, sidx, orig, None, False)
        gvars = jax.jit(geo_init)()

        def geo_fwd(gvars, rgb, dep, conf, orig, i, sidx=sidx):
            with cdt_scope(bf16):
                out = geo.apply(gvars, rgb + i.astype(rgb.dtype) * 1e-6,
                                dep, conf, dvals0, sidx, orig, None, False)
            return jnp.mean(out.astype(jnp.float32))

        timed(f"geofusion_stage{sidx + 1}", geo_fwd,
              (gvars, rgb, dep, conf, orig))

    # ---------------- fused cost volume per stage ----------------
    from damvsnet_tpu.ops.pallas.fused_costvol import fused_adaptive_cost_volume
    proj_full = {k: np.asarray(v) for k, v in batch["proj_matrices"].items()}
    for sidx in range(3):
        scale = 2 ** (2 - sidx)
        h, w, c, d = H // scale, W // scale, FC[sidx], D[sidx]
        fused_p = fuse_projection_matrices(
            jnp.asarray(proj_full[f"stage{sidx + 1}"]))
        ref_proj = fused_p[:, 0]
        src_projs = [fused_p[:, i] for i in range(1, NV)]
        ref = jnp.asarray(rs.random((1, h, w, c), np.float32), bf16)
        srcs = [jnp.asarray(rs.random((1, h, w, c), np.float32), bf16)
                for _ in range(NV - 1)]
        dv = jnp.asarray(
            np.broadcast_to(
                np.linspace(4.0, 8.0, d, np.float32)[None, :, None, None],
                (1, d, h, w)).copy())
        w1 = jnp.asarray(rs.random(c, np.float32))

        def cv_fwd(ref, srcs, dv, w1, i, sidx=sidx, ref_proj=ref_proj,
                   src_projs=src_projs):
            vol, _ = fused_adaptive_cost_volume(
                ref + i.astype(ref.dtype) * 1e-6, srcs, ref_proj, src_projs,
                dv, w1, 0.1, 1.0, 0.0)
            return jnp.mean(vol.astype(jnp.float32))

        timed(f"fused_costvol_stage{sidx + 1}", cv_fwd, (ref, srcs, dv, w1))

    # ---------------- CostRegNet per stage ----------------
    from damvsnet_tpu.nn.costreg import CostRegNet
    for sidx in range(3):
        scale = 2 ** (2 - sidx)
        h, w, c, d = H // scale, W // scale, FC[sidx], D[sidx]
        reg = CostRegNet(base_channels=8, depth_block=16)  # r3 BUG:
        # omitting depth_block timed the UNREPACKED path and
        # misattributed 195 ms to CostRegNet (VERDICT r3)
        vol = jnp.asarray(rs.random((1, d, h, w, c), np.float32), bf16)

        def reg_init(vol=vol, reg=reg):
            with cdt_scope(bf16):
                return reg.init(jax.random.PRNGKey(0), vol, False)
        rvars = jax.jit(reg_init)()

        # conv flop estimate (encoder+decoder, 3x3x3)
        def lvl(dd, hh, ww, ci, co):
            return 2 * dd * hh * ww * ci * co * 27
        f = (lvl(d, h, w, c, 8) + lvl(d // 2, h // 2, w // 2, 8, 16) * 2 +
             lvl(d // 4, h // 4, w // 4, 16, 32) * 2 +
             lvl(d // 8, h // 8, w // 8, 32, 64) * 2 +
             lvl(d // 4, h // 4, w // 4, 64, 32) +
             lvl(d // 2, h // 2, w // 2, 32, 16) +
             lvl(d, h, w, 16, 8) + lvl(d, h, w, 8, 1))

        def reg_fwd(rvars, vol, i, reg=reg):
            with cdt_scope(bf16):
                out = reg.apply(rvars, vol + i.astype(vol.dtype) * 1e-6, False)
            return jnp.mean(out.astype(jnp.float32))

        timed(f"costreg_stage{sidx + 1}", reg_fwd, (rvars, vol), flop=f)

    # ---------------- prob-volume stats per stage ----------------
    from damvsnet_tpu.ops.regression import prob_volume_stats
    from damvsnet_tpu.ops.pallas.probstats import prob_volume_stats_pallas
    on_tpu = jax.default_backend() == "tpu"
    for sidx in range(3):
        scale = 2 ** (2 - sidx)
        h, w, d = H // scale, W // scale, D[sidx]
        cr = jnp.asarray(rs.random((1, d, h, w), np.float32))
        dv = jnp.asarray(
            np.broadcast_to(
                np.linspace(4.0, 8.0, d, np.float32)[None, :, None, None],
                (1, d, h, w)).copy())

        def ps_fwd(cr, dv, i):
            if on_tpu:
                out = prob_volume_stats_pallas(cr + i.astype(cr.dtype) * 1e-6,
                                               dv)
            else:
                out = prob_volume_stats(cr + i.astype(cr.dtype) * 1e-6, dv)
            return jnp.mean(out["depth"])

        timed(f"probstats_stage{sidx + 1}", ps_fwd, (cr, dv))

    # ---------------- ADIA sampling + trilinear snap (stages 2/3) --------
    from damvsnet_tpu.ops.sampling import uncertainty_aware_samples
    from damvsnet_tpu.ops.resize import resize_trilinear_depth
    for sidx in (1, 2):
        scale = 2 ** (2 - sidx)
        h, w, d = H // scale, W // scale, D[sidx]
        cur_depth = jnp.asarray(5 + rs.random((1, 1, H, W), np.float32))
        cur_var = jnp.asarray(0.1 + rs.random((1, 1, H, W), np.float32))

        def samp_fwd(cur_depth, cur_var, i, d=d, h=h, w=w):
            s = uncertainty_aware_samples(
                cur_depth + i.astype(cur_depth.dtype) * 1e-6, cur_var,
                d, H, W)
            s = resize_trilinear_depth(s, (d, h, w))
            return jnp.mean(s)

        timed(f"sampling_stage{sidx + 1}", samp_fwd, (cur_depth, cur_var))

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PERF_STAGES_r04.json")
    known = sum(r.get("ms", 0.0) for r in RESULTS if r["name"] != "full_forward")
    # featurenet runs once per view
    known += sum(r.get("ms", 0.0) * (NV - 1)
                 for r in RESULTS if r["name"] == "featurenet_1view")
    full = next((r.get("ms") for r in RESULTS if r["name"] == "full_forward"),
                None)
    summary = {
        "config": {"H": H, "W": W, "nviews": NV, "ndepths": list(D),
                   "dtype": "bf16", "small": small},
        "device": str(jax.devices()[0]),
        "components": RESULTS,
        "sum_component_ms": round(known, 1),
        "full_forward_ms": full,
    }
    with open(out_path, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({"written": out_path, "sum_component_ms": round(known, 1),
                      "full_forward_ms": full}), flush=True)


if __name__ == "__main__":
    main()
