"""End-to-end smoke drives for the BlendedMVS finetune and TnT eval paths.

Builds synthetic on-disk trees shaped exactly like the real datasets and
drives the SHIPPED CLIs over them:

  A. BlendedMVS finetune (scripts/blendedmvs_finetune.sh semantics,
     /root/reference/scripts/blendedmvs_finetune.sh:21-29): save a
     "DTU" checkpoint, then `cli.train --dataset blendedmvs
     --loadckpt <ckpt>` for one epoch — exercises the cluster/pair
     parsing, ColorJitter/motion-blur augmentation, native-res K
     scaling, and weights-only restore.
  B. TnT eval (scripts/test_tnt.sh, /root/reference/scripts/
     test_tnt.sh:84-92): `cli.test --dataset tnt_eval_trans` over a
     TnT-layout scene (4-field depth line, per-scene size fallback)
     through DepthRunner -> reference-format outputs -> dypcd fusion
     (per-scene conf table consulted) -> PLY.

Writes SMOKE_E2E_r05.json. CPU-runnable:
    JAX_PLATFORMS=cpu timeout 3600 python scripts/smoke_finetune_tnt.py
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_blendedmvs_tree(root, scene="synth_blend", height=64, width=96,
                          nviews=5):
    """BlendedMVS layout: blended_images/ cams/(pair.txt, *_cam.txt)
    rendered_depth_maps/."""
    import cv2
    import numpy as np
    from damvsnet_tpu.core.cameras import write_cam_file
    from damvsnet_tpu.core.pfm import write_pfm
    from damvsnet_tpu.data.synthetic import render_synthetic_views

    sc = render_synthetic_views(height=height, width=width, nviews=nviews,
                                seed=7)
    sdir = os.path.join(root, scene)
    for sub in ("blended_images", "cams", "rendered_depth_maps"):
        os.makedirs(os.path.join(sdir, sub), exist_ok=True)
    dmin = sc["dmin"]
    interval = (sc["dmax"] - sc["dmin"]) / 128
    for v in range(nviews):
        cv2.imwrite(os.path.join(sdir, f"blended_images/{v:08d}.jpg"),
                    cv2.cvtColor((sc["imgs"][v] * 255).astype("uint8"),
                                 cv2.COLOR_RGB2BGR))
        write_cam_file(os.path.join(sdir, f"cams/{v:08d}_cam.txt"),
                       sc["intr"], sc["exts"][v], dmin, interval)
        write_pfm(os.path.join(sdir, f"rendered_depth_maps/{v:08d}.pfm"),
                  sc["depths"][v].astype(np.float32))
    with open(os.path.join(sdir, "cams/pair.txt"), "w") as f:
        f.write(f"{nviews}\n")
        for v in range(nviews):
            srcs = [s for s in range(nviews) if s != v]
            f.write(f"{v}\n{len(srcs)} "
                    + " ".join(f"{s} {100 - i}" for i, s in enumerate(srcs))
                    + "\n")
    listfile = os.path.join(root, "train_list.txt")
    with open(listfile, "w") as f:
        f.write(scene + "\n")
    return listfile


def build_tnt_tree(root, scene="SynthTemple", height=96, width=128, nviews=3):
    """TnT eval layout: {scene}/images {scene}/cams(+pair.txt), 4-field
    depth lines (depth_min interval num_depth depth_max)."""
    import cv2
    from damvsnet_tpu.core.cameras import write_cam_file
    from damvsnet_tpu.data.synthetic import render_synthetic_views

    sc = render_synthetic_views(height=height, width=width, nviews=nviews,
                                seed=11)
    sdir = os.path.join(root, scene)
    for sub in ("images", "cams"):
        os.makedirs(os.path.join(sdir, sub), exist_ok=True)
    dmin, dmax = sc["dmin"], sc["dmax"]
    nd = 96
    interval = (dmax - dmin) / nd
    for v in range(nviews):
        cv2.imwrite(os.path.join(sdir, f"images/{v:08d}.jpg"),
                    cv2.cvtColor((sc["imgs"][v] * 255).astype("uint8"),
                                 cv2.COLOR_RGB2BGR))
        write_cam_file(os.path.join(sdir, f"cams/{v:08d}_cam.txt"),
                       sc["intr"], sc["exts"][v], dmin, interval,
                       num_depth=nd, depth_max=dmax)
    with open(os.path.join(sdir, "pair.txt"), "w") as f:
        f.write(f"{nviews}\n")
        for v in range(nviews):
            srcs = [s for s in range(nviews) if s != v]
            f.write(f"{v}\n{len(srcs)} "
                    + " ".join(f"{s} {100 - i}" for i, s in enumerate(srcs))
                    + "\n")
    return scene


def main():
    t0 = time.time()
    import jax
    import numpy as np
    import optax

    report = {"device": str(jax.devices()[0])}
    work = tempfile.mkdtemp(prefix="smoke_ft_tnt_")

    # ---------------- A. BlendedMVS finetune ----------------------------
    from __graft_entry__ import _example_batch
    from damvsnet_tpu.model import CascadeMVSNet
    from damvsnet_tpu.train.state import create_train_state, save_checkpoint

    blend_root = os.path.join(work, "blendedmvs")
    listfile = build_blendedmvs_tree(blend_root)

    # a "DTU-trained" checkpoint to finetune from (weights-only restore)
    seed_model = CascadeMVSNet(ndepths=(8, 8, 8))
    seed_batch = _example_batch(batch=1, nviews=3, height=32, width=32, d0=16)
    seed_state = create_train_state(seed_model, jax.random.PRNGKey(3),
                                    seed_batch, optax.adam(1e-3))
    dtu_ckpt_dir = os.path.join(work, "dtu_ckpt")
    os.makedirs(dtu_ckpt_dir)
    dtu_ckpt = save_checkpoint(dtu_ckpt_dir, seed_state)

    from damvsnet_tpu.cli.train import main as train_main
    ft_logdir = os.path.join(work, "ft_logdir")
    train_main([
        "--dataset", "blendedmvs", "--trainpath", blend_root,
        "--trainlist", listfile, "--loadckpt", dtu_ckpt,
        "--logdir", ft_logdir, "--epochs", "1", "--nviews", "5",
        "--numdepth", "32", "--ndepths", "8,8,8", "--batch_size", "1",
        "--num_workers", "0", "--dtype", "f32", "--summary_freq", "2",
        "--cache_dir", "~/.cache/jax_damvsnet",
    ])
    ft_ckpts = [d for d in os.listdir(ft_logdir) if d.startswith("ckpt_")]
    assert ft_ckpts, "finetune wrote no checkpoint"
    report["finetune"] = {
        "tree": blend_root, "epochs": 1,
        "checkpoints": sorted(ft_ckpts),
        "loadckpt_from": dtu_ckpt,
    }
    print("finetune smoke OK:", report["finetune"], flush=True)

    # ---------------- B. TnT eval path ----------------------------------
    tnt_root = os.path.join(work, "tnt")
    scene = build_tnt_tree(tnt_root)
    tnt_list = os.path.join(work, "tnt_list.txt")
    with open(tnt_list, "w") as f:
        f.write(scene + "\n")

    from damvsnet_tpu.cli.test import main as test_main
    tnt_out = os.path.join(work, "tnt_out")
    test_main([
        "--dataset", "tnt_eval_trans", "--testpath", tnt_root,
        "--testlist", tnt_list, "--outdir", tnt_out,
        "--num_view", "3", "--numdepth", "48", "--interval_scale", "1.0",
        "--ndepths", "8,8,8", "--max_h", "96", "--max_w", "128",
        "--dtype", "f32", "--filter_method", "dypcd",
        "--conf", "0.0,0.0,0.0",
    ])
    ply = os.path.join(tnt_out, f"{scene}.ply")
    assert os.path.exists(ply), "TnT dypcd fusion wrote no PLY"
    from damvsnet_tpu.core.ply import read_ply
    pts, _ = read_ply(ply)
    view_files = os.listdir(os.path.join(tnt_out, scene, "depth_est"))
    report["tnt"] = {
        "tree": tnt_root, "scene": scene,
        "depth_files": sorted(view_files),
        "ply_points": int(len(pts)),
    }
    assert len(pts) > 0
    print("tnt smoke OK:", report["tnt"], flush=True)

    report["elapsed_sec"] = round(time.time() - t0, 1)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SMOKE_E2E_r05.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
