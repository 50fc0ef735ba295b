"""Tanks-and-Temples evaluation loader.

Parity with /root/reference/datasets/tnt_eval_trans.py: per-scene native
image sizes (1920/2048 x 1080, snapped to x32 => height 1056), intrinsics
pre-divided by 4, 4-field depth-line handling, per-scene interval scales.
"""
from __future__ import annotations

import os

import numpy as np

from ..core.cameras import stage_intrinsics, stage_proj_matrices
from ..core.pairs import read_pair_file
from .general_eval import scale_mvs_input

IMAGE_SIZES = {
    "Family": (1920, 1080), "Francis": (1920, 1080), "Horse": (1920, 1080),
    "Lighthouse": (2048, 1080), "M60": (2048, 1080), "Panther": (2048, 1080),
    "Playground": (1920, 1080), "Train": (1920, 1080),
    "Auditorium": (1920, 1080), "Ballroom": (1920, 1080),
    "Courtroom": (1920, 1080), "Museum": (1920, 1080),
    "Palace": (1920, 1080), "Temple": (1920, 1080),
}


class TnTEvalDataset:
    def __init__(self, datapath, listfile, mode, nviews, ndepths=192,
                 interval_scale=1.0, max_h=704, max_w=1280, **kwargs):
        assert mode == "test"
        self.datapath = datapath
        self.nviews = nviews
        self.ndepths = ndepths
        self.max_h = max_h
        self.max_w = max_w
        self.scans = listfile
        if isinstance(interval_scale, float):
            self.interval_scale = {s: interval_scale for s in listfile}
        else:
            self.interval_scale = interval_scale
        self.metas = self._build_list()

    def _build_list(self):
        metas = []
        for scan in self.scans:
            pairs = read_pair_file(os.path.join(self.datapath, scan, "pair.txt"))
            for ref_view, src_views in pairs:
                if len(src_views) < self.nviews:
                    src_views = src_views + [src_views[0]] * (self.nviews - len(src_views))
                metas.append((scan, ref_view, src_views, scan))
        return metas

    def __len__(self):
        return len(self.metas)

    def _read_cam_file(self, filename, interval_scale):
        with open(filename) as f:
            lines = [line.rstrip() for line in f.readlines()]
        extrinsics = np.fromstring(" ".join(lines[1:5]), dtype=np.float32,
                                   sep=" ").reshape(4, 4)
        intrinsics = np.fromstring(" ".join(lines[7:10]), dtype=np.float32,
                                   sep=" ").reshape(3, 3)
        intrinsics[:2, :] /= 4.0
        fields = lines[11].split()
        depth_min = float(fields[0])
        depth_interval = float(fields[1])
        if len(fields) >= 3:
            num_depth = int(float(fields[2]))
            depth_max = depth_min + num_depth * depth_interval
            depth_interval = (depth_max - depth_min) / self.ndepths
        depth_interval *= interval_scale
        return intrinsics, extrinsics, depth_min, depth_interval

    @staticmethod
    def _read_img(filename):
        from PIL import Image
        return np.asarray(Image.open(filename), dtype=np.float32) / 255.0

    def __getitem__(self, idx):
        scan, ref_view, src_views, scene_name = self.metas[idx]
        nviews = min(self.nviews, len(src_views) + 1)
        view_ids = [ref_view] + src_views[: nviews - 1]

        imgs = []
        proj_matrices = []
        depth_values = None
        intrinsics = None
        for i, vid in enumerate(view_ids):
            img_filename = os.path.join(self.datapath, f"{scan}/images/{vid:0>8}.jpg")
            cam_filename = os.path.join(self.datapath, f"{scan}/cams/{vid:0>8}_cam.txt")
            img = self._read_img(img_filename)
            intrinsics, extrinsics, depth_min, depth_interval = self._read_cam_file(
                cam_filename, self.interval_scale[scene_name])
            max_w, max_h = IMAGE_SIZES.get(scan, (self.max_w, self.max_h))
            img, intrinsics = scale_mvs_input(img, intrinsics, max_w, max_h)
            imgs.append(img)
            proj = np.zeros((2, 4, 4), np.float32)
            proj[0] = extrinsics
            proj[1, :3, :3] = intrinsics
            proj_matrices.append(proj)
            if i == 0:
                depth_values = np.arange(
                    depth_min, depth_interval * (self.ndepths - 0.5) + depth_min,
                    depth_interval, dtype=np.float32)

        imgs = np.stack(imgs).astype(np.float32)
        proj_matrices = np.stack(proj_matrices)
        return {
            "imgs": imgs,
            "proj_matrices": stage_proj_matrices(proj_matrices),
            "depth_values": depth_values,
            "intrinsics_matrices": stage_intrinsics(intrinsics),
            "filename": scan + "/{}/" + f"{view_ids[0]:0>8}" + "{}",
        }
