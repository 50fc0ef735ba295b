"""On-chip numerical parity of the Pallas inference kernels vs XLA.

Round-2 lesson (PERF.md): Pallas interpret mode accepted f32 iota that
Mosaic rejected on hardware — interpret-mode parity tests can lie. This
script runs the REAL kernels on the TPU at the full DTU bench rig
(1152x864, N=5, D=(64,32,8), bf16) and records max-abs-diffs between the
fused Pallas forward (banded cost volume + fused prob stats) and the XLA
forward for depth / confidence / sigma, plus the sampler overflow count.

Numerics contract: /root/reference/models/module.py:297-332 (warp),
:510-541 (CostRegNet), cas_mvsnet.py:64-87 (adaptive aggregation).
bf16 features bound the expected divergence: the two paths round the
warp matmul differently, so diffs up to ~1e-2 x value scale are the
bf16 noise floor, not kernel bugs (tolerances asserted by the driver
reading KERNEL_PARITY_r04.json).

    timeout 7000 python scripts/kernel_parity_onchip.py
"""
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

    from damvsnet_tpu.data.synthetic import make_synthetic_sample
    from damvsnet_tpu.model import CascadeMVSNet

    small = bool(os.environ.get("PARITY_SMALL"))
    H, W, NV = (256, 320, 3) if small else (864, 1152, 5)
    out_name = os.environ.get("PARITY_OUT", "KERNEL_PARITY_r04.json")

    # geometrically consistent rig (random features make depth ill-posed;
    # parity diffs would then be dominated by argmax flips between
    # near-tied hypotheses instead of kernel numerics)
    sample = make_synthetic_sample(height=H, width=W, nviews=NV, ndepths=192,
                                   with_gt=False, seed=3)
    # Image contrast scale: sharpens the (untrained-weights) cost volumes
    # so stage-1 sigma — and with it the ADIA stage-2/3 per-pixel depth
    # ranges — stays at trained-model-like magnitudes instead of spanning
    # the whole 192-interval sweep (which legitimately overflows the
    # banded window and triggers the XLA fallback in production). Input-
    # value-only change: iterates without recompiling.
    img_scale = float(os.environ.get("PARITY_IMG_SCALE", "1"))
    batch = {
        "imgs": jnp.asarray(sample["imgs"][None] * img_scale),
        "proj_matrices": {k: jnp.asarray(v[None])
                          for k, v in sample["proj_matrices"].items()},
        "depth_values": jnp.asarray(sample["depth_values"][None]),
        "intrinsics_matrices": {k: jnp.asarray(v[None])
                                for k, v in sample["intrinsics_matrices"].items()},
    }
    kw = dict(ndepths=(64, 32, 8), compute_dtype=jnp.bfloat16)
    opts = {}
    for k in ("wb", "band_rows", "depth_group"):
        if os.environ.get(f"PARITY_{k.upper()}"):
            opts[k] = int(os.environ[f"PARITY_{k.upper()}"])
    if os.environ.get("PARITY_STAGE_OPTS"):
        import json as _json
        opts.update(_json.loads(os.environ["PARITY_STAGE_OPTS"]))
    clamp = bool(os.environ.get("PARITY_CLAMP"))
    pall = CascadeMVSNet(sampler="pallas", stats_kernel="pallas",
                         sampler_opts=opts or None, clamp_samples=clamp,
                         **kw)
    xla = CascadeMVSNet(sampler="xla", stats_kernel="xla",
                        clamp_samples=clamp, **kw)

    variables = jax.jit(pall.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch["imgs"], batch["proj_matrices"],
        batch["depth_values"], batch["intrinsics_matrices"], train=False)

    ckpt = os.environ.get("PARITY_CKPT")
    if ckpt:
        # TRAINED weights (e.g. the e2e_synthetic checkpoint — the model
        # is fully convolutional, so low-res-trained weights run the full
        # rig): with random weights stage-1 sigma spans the whole sweep
        # and the ADIA stage-2/3 ranges legitimately overflow the banded
        # window (the production contract is the XLA fallback, but the
        # parity artifact wants overflow 0 on a well-conditioned rig)
        import optax
        from __graft_entry__ import _example_batch
        from damvsnet_tpu.train.state import (create_train_state,
                                              restore_checkpoint)
        small_b = _example_batch(batch=1, nviews=3, height=32, width=32,
                                 d0=16)
        state = create_train_state(pall, jax.random.PRNGKey(0), small_b,
                                   optax.adam(1e-3))
        state = restore_checkpoint(ckpt, state, weights_only=True)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}

    def run(model):
        @jax.jit
        def fwd(variables, imgs, proj, dvals, intr):
            out = model.apply(variables, imgs, proj, dvals, intr, train=False)
            keep = {"depth": out["depth"].astype(jnp.float32),
                    "conf": out["photometric_confidence"].astype(jnp.float32),
                    "sigma": out["variance"].astype(jnp.float32),
                    "overflow": out["sampler_overflow"],
                    "overflow_stages": jnp.stack(
                        [out[f"stage{s}"]["sampler_overflow"]
                         for s in (1, 2, 3)])}
            for s in (1, 2):
                keep[f"depth{s}"] = out[f"stage{s}"]["depth"].astype(
                    jnp.float32)
            return keep

        t0 = time.time()
        res = jax.device_get(fwd(batch_args[0], *batch_args[1:]))
        return res, time.time() - t0

    batch_args = (variables, batch["imgs"], batch["proj_matrices"],
                  batch["depth_values"], batch["intrinsics_matrices"])

    got, t_pallas = run(pall)
    want, t_xla = run(xla)

    depth_range = float(np.ptp(np.asarray(batch["depth_values"])))

    def stats(key):
        a, b = got[key], want[key]
        d = np.abs(a - b)
        return {"max_abs_diff": float(d.max()),
                "mean_abs_diff": float(d.mean()),
                "p999_abs_diff": float(np.quantile(d, 0.999))}

    report = {
        "config": {"H": H, "W": W, "nviews": NV, "ndepths": [64, 32, 8],
                   "dtype": "bf16", "small": small},
        "device": str(jax.devices()[0]),
        "depth_range": depth_range,
        "sampler_overflow": int(got["overflow"]),
        "sampler_overflow_per_stage": [int(x) for x in
                                       got["overflow_stages"]],
        "sampler_opts": opts,
        "clamp_samples": clamp,
        "img_scale": img_scale,
        "diffs": {k: stats(k) for k in
                  ("depth", "conf", "sigma", "depth1", "depth2")},
        "first_call_sec": {"pallas": round(t_pallas, 1),
                           "xla": round(t_xla, 1)},
    }
    # the driver-checkable verdict: bf16-scale agreement, no dropped taps
    tol_depth = max(1e-2, 2e-3 * depth_range)  # bf16 noise floor in depth
    # conf compares at p999, not max: photometric confidence is a
    # 4-window prob sum gathered at the argmax, so ONE bf16-rounding
    # argmax flip at a near-tied pixel legitimately moves that pixel's
    # conf by ~0.3 — a per-pixel tail event, not kernel error
    report["pass"] = bool(
        report["sampler_overflow"] == 0
        and report["diffs"]["depth"]["p999_abs_diff"] < tol_depth
        and report["diffs"]["conf"]["p999_abs_diff"] < 0.05
        and report["diffs"]["sigma"]["p999_abs_diff"] < tol_depth * 3)
    report["tol_depth"] = tol_depth

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), out_name)
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({"written": out_path, "pass": report["pass"],
                      "overflow": report["sampler_overflow"],
                      "depth_max_abs_diff":
                          report["diffs"]["depth"]["max_abs_diff"]}),
          flush=True)


if __name__ == "__main__":
    main()
