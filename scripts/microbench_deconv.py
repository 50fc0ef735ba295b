"""Microbench: is a TPU lhs-dilated conv (transposed conv) paying for the
inserted zeros? Times the stage2 level-0 repacked decoder deconv shape
(the whale in PERF_STAGES_r03.json: costreg_stage2 = 104 ms) three ways:

  1. lhs-dilated conv (current deconv3d_repacked lowering)
  2. same-FLOP stride-1 conv (what polyphase decomposition would run, x8)
  3. polyphase-equivalent: 8 phase convs w/ 2x2x2-ish taps (exact FLOPs)

    timeout 1200 python scripts/microbench_deconv.py
"""
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

    rs = np.random.default_rng(0)

    def timed(name, fn, args, iters_long=32, iters_short=4, flop=None):
        @jax.jit
        def loop(args, iters):
            def body(c):
                i, acc = c
                return i + 1, acc + fn(*args, i)
            return jax.lax.while_loop(lambda c: c[0] < iters, body,
                                      (jnp.int32(0), jnp.float32(0.0)))[1]
        t0 = time.perf_counter(); float(loop(args, jnp.int32(1)))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter(); float(loop(args, jnp.int32(iters_short)))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter(); float(loop(args, jnp.int32(iters_long)))
        tl = time.perf_counter() - t0
        ms = (tl - ts) / (iters_long - iters_short) * 1e3
        msg = f"{name}: {ms:.3f} ms (compile {tc:.1f}s)"
        if flop:
            msg += f"  {flop/1e9:.1f} GFLOP -> {flop/(ms*1e-3)/1e12:.1f} TF/s"
        print(msg, flush=True)
        return ms

    # stage2 level-1 -> level-0 decoder deconv, repacked b_in=16, b_out=16:
    # x [1, Dblk=1, 216, 288, 16*32=512] -> y [1, 2, 432, 576, 16*16=256]
    # (D=32 at level0 -> Dblk=2 blocks of 16; level1 D=16 -> 1 block of 16)
    B, DBLK, H, W = 1, 1, 216, 288
    CI, CO = 512, 256
    x = jnp.asarray(rs.random((B, DBLK, H, W, CI), np.float32), jnp.bfloat16)
    w = jnp.asarray(rs.random((3, 3, 3, CI, CO), np.float32) * 0.01,
                    jnp.bfloat16)
    dn = ("NDHWC", "DHWIO", "NDHWC")

    def dilated(x, w, i):
        y = jax.lax.conv_general_dilated(
            x + i.astype(x.dtype) * 1e-6, w, window_strides=(1, 1, 1),
            padding=((1, 2), (1, 2), (1, 2)), lhs_dilation=(2, 2, 2),
            dimension_numbers=dn)
        return jnp.sum(y.astype(jnp.float32)) * 1e-9

    # output elements: 2*DBLK * 2H * 2W * CO; taps 27*CI each (dense model)
    out_el = (2 * DBLK) * (2 * H) * (2 * W) * CO
    flop_true = 2 * out_el * CI * 27 / 8  # each output touches ~27/8 live taps
    timed("deconv_lhs_dilated", dilated, (x, w), flop=int(flop_true))

    # phase conv: one of the 8 polyphase convs (tap count 2x2x2), output
    # same spatial size as input; x8 of these = the whole deconv
    wp = w[:2, :2, :2]

    def phase(x, wp, i):
        y = jax.lax.conv_general_dilated(
            x + i.astype(x.dtype) * 1e-6, wp, window_strides=(1, 1, 1),
            padding=((1, 0), (1, 0), (1, 0)), dimension_numbers=dn)
        return jnp.sum(y.astype(jnp.float32)) * 1e-9

    ms_ph = timed("one_phase_conv(2,2,2)", phase, (x, wp),
                  flop=2 * DBLK * H * W * CO * CI * 8)

    def allphase(x, w, i):
        xs = x + i.astype(x.dtype) * 1e-6
        acc = jnp.float32(0.0)
        outs = []
        for pd in range(2):
            for ph in range(2):
                for pw in range(2):
                    kd = w[pd::2][::-1]
                    kk = kd[:, ph::2][:, ::-1]
                    kk = kk[:, :, pw::2][:, :, ::-1]
                    t = kk.shape[:3]
                    pads = tuple((tt - 1, 0) if tt > 1 else (0, 0)
                                 for tt in t)
                    y = jax.lax.conv_general_dilated(
                        xs, kk, window_strides=(1, 1, 1), padding=pads,
                        dimension_numbers=dn)
                    outs.append(y)
        y = jnp.stack(outs, axis=-2)
        return jnp.sum(y.astype(jnp.float32)) * 1e-9

    timed("polyphase_8convs", allphase, (x, w),
          flop=int(flop_true))


if __name__ == "__main__":
    main()
