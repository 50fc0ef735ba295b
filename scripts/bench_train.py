"""On-chip training throughput at the reference DTU train recipe.

Measures full train steps (forward + CPC loss + backward + Adam update +
BN stat mutation) at the reference geometry — 512x640 images, batch 4,
N=5 views, D0=192 hypotheses, ndepths=(64,32,8), bf16 compute — and
writes BENCH_TRAIN_r05.json. Reference recipe: train.py:35-44,92-172
(16 epochs x batch 4 x N=5 x D=192, Adam 1e-3), scripts/train.sh:32-35.

Timing methodology matches bench.py: the TPU hangs off a remote tunnel
(block_until_ready doesn't block; transfers ~20 MB/s), so the step loop
runs inside ONE XLA while_loop with a dynamic trip count, the optimizer
state threaded through the carry, inputs perturbed per step against
loop-invariant hoisting; per-step time = (t_long - t_short) / d_iters.

The fused-VJP variant (the headline train path) runs FIRST and the file
is written after each variant, so a slow compile or OOM in the XLA
variant cannot sink the whole artifact (what happened to the r4
full-recipe run). The fused variant also counts banded-sampler overflow
steps (stages that dropped taps x steps) — must be 0 for the numbers to
stand.

    BENCH_TRAIN_SMALL=1 for a quick 256x320 B=2 N=3 smoke run.
    BENCH_TRAIN_SKIP_XLA=1 to measure only the fused path.
    timeout 7000 python scripts/bench_train.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_damvsnet"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _example_batch
    from damvsnet_tpu.losses import cas_mvsnet_loss
    from damvsnet_tpu.model import CascadeMVSNet

    small = bool(os.environ.get("BENCH_TRAIN_SMALL"))
    B, NV, H, W, D0 = (2, 3, 256, 320, 96) if small else (4, 5, 512, 640, 192)
    iters_long = int(os.environ.get("BENCH_ITERS", "8"))
    iters_short = max(1, iters_long // 8)

    base = CascadeMVSNet(ndepths=(64, 32, 8), compute_dtype=jnp.bfloat16)
    batch = _example_batch(batch=B, nviews=NV, height=H, width=W, d0=D0)
    variables = jax.jit(base.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch["imgs"], batch["proj_matrices"],
        batch["depth_values"], batch["intrinsics_matrices"], train=False)
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])

    def make_bench_loop(model):
        def loss_fn(params, batch_stats, imgs, batch):
            out, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                imgs, batch["proj_matrices"], batch["depth_values"],
                batch["intrinsics_matrices"], train=True,
                mutable=["batch_stats"])
            total, _, _ = cas_mvsnet_loss(
                out, imgs, batch["proj_matrices"], batch["depth"],
                batch["mask"], use_cpc=True)
            return total, (mutated["batch_stats"], out["sampler_overflow"])

        @jax.jit
        def bench_loop(params, batch_stats, opt_state, batch, iters):
            def cond(c):
                return c[0] < iters

            def body(c):
                i, params, bs, opt_state, acc, of = c
                imgs = batch["imgs"] + (i.astype(batch["imgs"].dtype) * 1e-6)
                (total, (new_bs, step_of)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, bs, imgs, batch)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (i + 1, params, new_bs, opt_state, acc + total,
                        of + jnp.int32(step_of))

            init = (jnp.int32(0), params, batch_stats, opt_state,
                    jnp.float32(0.0), jnp.int32(0))
            out = jax.lax.while_loop(cond, body, init)
            return out[-2], out[-1]
        return bench_loop

    args = (variables["params"], variables["batch_stats"], opt_state, batch)

    def measure(bench_loop):
        t0 = time.perf_counter()
        _, of = bench_loop(*args, jnp.int32(1))  # compile + warm
        overflow = int(of)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(bench_loop(*args, jnp.int32(iters_short))[0])
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        acc, of = bench_loop(*args, jnp.int32(iters_long))
        float(acc)
        t_long = time.perf_counter() - t0
        dt = (t_long - t_short) / (iters_long - iters_short)
        return dt, compile_s, int(of)

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_TRAIN_r05.json")
    rows = {}

    def report_out(best_dt):
        report = {
            "metric": f"train_steps_per_sec_{W}x{H}_B{B}_N{NV}_D{D0}",
            "value": round(1.0 / best_dt, 4),
            "unit": "steps/sec/chip",
            "samples_per_sec": round(B / best_dt, 4),
            "sec_per_step": round(best_dt, 4),
            "variants": rows,
            "config": {"B": B, "nviews": NV, "H": H, "W": W, "D0": D0,
                       "ndepths": [64, 32, 8], "dtype": "bf16",
                       "loss": "smooth-L1 staged + 12x CPC", "opt": "adam"},
            "device": str(jax.devices()[0]),
        }
        if not small:
            with open(out_path, "w") as fh:
                json.dump(report, fh, indent=1)
        print(json.dumps(report), flush=True)

    # variant 1 (headline): fused Pallas cost volume with its custom VJP.
    # clamp_samples bounds ADIA hypotheses into the input sweep so the
    # window budgets hold (cli/train.py ships the same pairing).
    # BENCH_TRAIN_SAMPLER_OPTS overrides the per-stage windows (set them
    # from scripts/compute_windows.py for the rig so overflow_steps = 0).
    fused_opts = {"depth_group": 16}
    if os.environ.get("BENCH_TRAIN_SAMPLER_OPTS"):
        fused_opts = json.loads(os.environ["BENCH_TRAIN_SAMPLER_OPTS"])
    fused = base.clone(fused_train=True, clamp_samples=True,
                       sampler_opts=fused_opts)
    dt_f, compile_f, of_f = measure(make_bench_loop(fused))
    rows["fused_vjp"] = {"sec_per_step": round(dt_f, 4),
                         "steps_per_sec": round(1.0 / dt_f, 4),
                         "compile_s": round(compile_f, 1),
                         "overflow_steps": of_f}
    print(json.dumps({"variant": "fused_vjp", **rows["fused_vjp"]}),
          flush=True)
    report_out(dt_f)

    # variant 2: XLA gather sampler (the r3 train path / parity baseline)
    if not os.environ.get("BENCH_TRAIN_SKIP_XLA"):
        try:
            dt_x, compile_x, _ = measure(make_bench_loop(base))
            rows["xla_sampler"] = {"sec_per_step": round(dt_x, 4),
                                   "steps_per_sec": round(1.0 / dt_x, 4),
                                   "compile_s": round(compile_x, 1)}
            rows["fused_vjp"]["speedup_vs_xla"] = round(dt_x / dt_f, 3)
            print(json.dumps({"variant": "xla_sampler",
                              **rows["xla_sampler"]}), flush=True)
            report_out(min(dt_f, dt_x))
        except Exception as e:  # keep the fused artifact on XLA-variant OOM
            rows["xla_sampler"] = {"error": repr(e)[:300]}
            report_out(dt_f)


if __name__ == "__main__":
    main()
