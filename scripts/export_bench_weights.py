"""Export a trained e2e_synthetic checkpoint as weights/bench_ckpt.npz.

The bench (bench.py) overlays this flat snapshot onto its init variables
so the measured ADIA sigma — and with it the banded sampler's actual
spans — matches the trained-serving regime instead of the untrained
blown-sigma worst case. The model is fully convolutional: weights trained
at 128x160/(16,8,8) load unchanged into the 1152x864/(64,32,8) bench
model (parameters depend on neither resolution nor hypothesis counts).

    python scripts/export_bench_weights.py /tmp/e2e_qon16/ckpt/ckpt_000016
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ckpt = sys.argv[1]
    import jax
    import orbax.checkpoint as ocp

    payload = ocp.PyTreeCheckpointer().restore(os.path.abspath(ckpt))
    variables = {"params": payload["params"],
                 "batch_stats": payload["batch_stats"]}
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        key = "/".join(str(getattr(k, "key", k)) for k in kp)
        flat[key] = np.asarray(leaf)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "weights", "bench_ckpt.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, **flat)
    mb = os.path.getsize(out) / 1e6
    print(f"wrote {out}: {len(flat)} arrays, {mb:.1f} MB "
          f"(step {payload.get('step')}, epoch {payload.get('epoch')})")


if __name__ == "__main__":
    main()
