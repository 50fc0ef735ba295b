"""Worker for the 2-process scan-parallel inference test.

Launched by tests/test_multiprocess.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID in the environment (the standard
manual jax.distributed configuration). Mirrors what cli/test.py does
under a multi-process launch: rendezvous, take testlist[i::n], run depth
inference on the owned scenes into the shared outdir, report ownership.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    import numpy as np  # noqa: F401

    from damvsnet_tpu.data.general_eval import GeneralEvalDataset
    from damvsnet_tpu.infer.runner import DepthRunner, save_scene_depth
    from damvsnet_tpu.model import CascadeMVSNet
    from damvsnet_tpu.parallel import (maybe_initialize_distributed,
                                       shard_work_items)

    cfg = json.loads(os.environ["MP_CONFIG"])
    process_index, process_count = maybe_initialize_distributed()
    scenes = shard_work_items(cfg["scenes"])

    model = CascadeMVSNet(ndepths=(8, 8, 8), use_geo_fusion=False)
    runner = None
    for scene in scenes:
        ds = GeneralEvalDataset(cfg["datadir"], [scene], "test",
                                cfg["nviews"], ndepths=cfg["d0"],
                                interval_scale=1.0, max_h=cfg["height"],
                                max_w=cfg["width"])
        if runner is None:
            sample = ds[0]
            batch = {k: (v[None] if hasattr(v, "ndim")
                         else {kk: vv[None] for kk, vv in v.items()})
                     for k, v in sample.items() if k != "filename"}
            variables = jax.jit(model.init, static_argnames=("train",))(
                jax.random.PRNGKey(0), batch["imgs"],
                batch["proj_matrices"], batch["depth_values"],
                batch["intrinsics_matrices"], train=False)
            runner = DepthRunner(model, variables, log_fn=lambda *_: None)
        save_scene_depth(runner, ds, cfg["outdir"], batch_size=1,
                         log_fn=lambda *_: None)

    with open(os.path.join(cfg["outdir"],
                           f"owner_{process_index}.json"), "w") as f:
        json.dump({"process_index": process_index,
                   "process_count": process_count,
                   "scenes": scenes}, f)


if __name__ == "__main__":
    main()
