"""Per-scene depth inference runner.

Parity with save_scene_depth (/root/reference/test_uni.py:207-290): for each
reference view write depth_est/{v}.pfm (+_stage2/_stage1), confidence maps
(stage1/2 nearest-upsampled to full resolution), cams/{v}_cam.txt and
images/{v}.jpg under outdir/scene/.
"""
from __future__ import annotations

import os
import time

import jax
import numpy as np

from ..core.cameras import write_cam_file
from ..core.pfm import write_pfm
from ..data.common import DataLoader


class DepthRunner:
    """Jitted forward wrapper: (variables, batch) -> stage outputs.

    Safety net for the banded Pallas sampler: if the forward reports
    ``sampler_overflow`` (a stage dropped out-of-window bilinear taps —
    degraded cost-volume values), the batch is transparently redone with
    the model's XLA gather sampler, which has no window constraint. The
    XLA forward is compiled lazily, only on first overflow.
    """

    def __init__(self, model, variables, log_fn=print):
        self.model = model
        # pin the weights on device ONCE: checkpoint-restored variables are
        # host numpy arrays, and leaving them host-side makes every jitted
        # call re-upload them through the ~20 MB/s tunnel (measured as the
        # entire 6.8 s/view "dispatch" phase in ACCURACY_r04's first cut)
        import jax as _jax
        self.variables = _jax.device_put(variables)
        self.log_fn = log_fn
        self.overflow_batches = 0
        # phase breakdown accumulators (seconds): dispatch = jitted call
        # returning (host->device upload + trace lookup), fetch =
        # device_get (device compute + device->host download) — the
        # split that localizes runner overhead vs chip time
        self.time_dispatch = 0.0
        self.time_fetch = 0.0

        def trim(out):
            # only what save_scene_depth writes — fetching the full output
            # dict (prob volumes, per-stage depth_values) wastes host<->
            # device bandwidth (the remote-tunnel link runs ~20 MB/s)
            keep = {"depth": out["depth"],
                    "photometric_confidence": out["photometric_confidence"],
                    "sampler_overflow": out["sampler_overflow"]}
            for i in range(1, model.num_stage):
                s = f"stage{i}"
                keep[s] = {
                    "depth": out[s]["depth"],
                    "photometric_confidence":
                        out[s]["photometric_confidence"],
                }
            return keep

        def make_forward(m):
            def forward(variables, imgs, proj_matrices, depth_values,
                        intrinsics):
                return trim(m.apply(variables, imgs, proj_matrices,
                                    depth_values, intrinsics, train=False))
            return jax.jit(forward)

        self._make_forward = make_forward
        self._forward = make_forward(model)
        self._forward_xla = None

    def _xla_forward(self):
        if self._forward_xla is None:
            self._forward_xla = self._make_forward(
                self.model.clone(sampler="xla"))
        return self._forward_xla

    def __call__(self, batch):
        args = (self.variables, batch["imgs"], batch["proj_matrices"],
                batch["depth_values"], batch.get("intrinsics_matrices"))
        t0 = time.time()
        pending = self._forward(*args)
        t1 = time.time()
        out = jax.device_get(pending)
        t2 = time.time()
        self.time_dispatch += t1 - t0
        self.time_fetch += t2 - t1
        if self.model.sampler != "xla" and int(out.get("sampler_overflow", 0)):
            self.overflow_batches += 1
            self.log_fn("warning: banded sampler window overflow "
                        f"({int(out['sampler_overflow'])} stage(s)) — "
                        "redoing batch with the XLA sampler")
            out = jax.device_get(self._xla_forward()(*args))
        return out


def _upsample_nearest_np(img, out_hw):
    import cv2
    return cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_NEAREST)


def save_scene_depth(runner: DepthRunner, dataset, outdir: str,
                     batch_size: int = 1, log_fn=print):
    """Run depth inference over a dataset and save reference-format outputs.

    Returns (count, total_time, batch_times): batch_times[0] includes the
    jit compile (minutes over the tunnel), so steady-state throughput is
    ``sum(batch_times[1:]) / (count - first_batch_n)`` with first_batch_n
    the *measured* size of batch 0 (may be partial under drop_last=False)
    — callers reporting sec/view should use that, not total_time / count.
    """
    loader = DataLoader(dataset, batch_size=batch_size, shuffle=False,
                        drop_last=False, num_workers=2)
    num_stage = runner.model.num_stage
    batch_times = []
    count = 0
    first_batch_n = 0  # actual size of batch 0 (may be partial with
    # drop_last=False) — the steady-state denominator must subtract it,
    # not the nominal batch_size
    write_time = 0.0
    for batch in loader:
        t0 = time.time()
        outputs = runner({k: v for k, v in batch.items() if k != "filename"})
        batch_times.append(time.time() - t0)
        t_w = time.time()
        if not count:
            first_batch_n = batch["imgs"].shape[0]
        count += batch["imgs"].shape[0]
        cams = batch["proj_matrices"][f"stage{num_stage}"]
        for i, filename in enumerate(batch["filename"]):
            depth_est = outputs["depth"][i]
            conf = outputs["photometric_confidence"][i]
            h, w = conf.shape

            paths = {
                "depth": filename.format("depth_est", ".pfm"),
                "conf": filename.format("confidence", ".pfm"),
                "cam": filename.format("cams", "_cam.txt"),
                "img": filename.format("images", ".jpg"),
            }
            stage_outs = {}
            for s in range(1, num_stage):
                paths[f"depth{s}"] = filename.format("depth_est",
                                                     f"_stage{s}.pfm")
                paths[f"conf{s}"] = filename.format("confidence",
                                                    f"_stage{s}.pfm")
                # lower-stage confidence upsampled to full res (parity:
                # test_uni.py:246-287)
                stage_outs[s] = (
                    outputs[f"stage{s}"]["depth"][i],
                    _upsample_nearest_np(
                        outputs[f"stage{s}"]["photometric_confidence"][i],
                        (h, w)))
            for p in paths.values():
                os.makedirs(os.path.join(outdir, os.path.dirname(p)), exist_ok=True)
            write_pfm(os.path.join(outdir, paths["depth"]), depth_est.astype(np.float32))
            write_pfm(os.path.join(outdir, paths["conf"]), conf.astype(np.float32))
            for s, (dep_s, conf_s) in stage_outs.items():
                write_pfm(os.path.join(outdir, paths[f"depth{s}"]),
                          dep_s.astype(np.float32))
                write_pfm(os.path.join(outdir, paths[f"conf{s}"]),
                          conf_s.astype(np.float32))
            cam = cams[i, 0]
            write_cam_file(os.path.join(outdir, paths["cam"]),
                           cam[1, :3, :3], cam[0], 0.0, 0.0)
            img = np.clip(batch["imgs"][i, 0] * 255, 0, 255).astype(np.uint8)
            import cv2
            cv2.imwrite(os.path.join(outdir, paths["img"]),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        write_time += time.time() - t_w
    total_time = sum(batch_times)
    if count:
        steady = (sum(batch_times[1:]) / max(1, count - first_batch_n)
                  if len(batch_times) > 1 else total_time / count)
        log_fn(f"inference: {count} views, {steady:.3f}s/view steady "
               f"(first batch {batch_times[0]:.1f}s incl. compile; "
               f"dispatch {runner.time_dispatch:.1f}s, "
               f"fetch {runner.time_fetch:.1f}s, "
               f"write {write_time:.1f}s total)")
    return count, total_time, batch_times
