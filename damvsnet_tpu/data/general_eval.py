"""Generic evaluation loader (DTU test / any MVSNet-format scene).

Parity with /root/reference/datasets/general_eval.py: intrinsics are
pre-divided by 4 at read (cam files carry full-res K), images are scaled
and snapped to multiples of 32 under (max_h, max_w), per-scene interval
scales, depth_values = arange over ndepths - 0.5 intervals, and a
``filename`` output template for writing results.
"""
from __future__ import annotations

import os

import numpy as np

from ..core.cameras import stage_intrinsics, stage_proj_matrices
from ..core.pairs import read_pair_file


def scale_mvs_input(img, intrinsics, max_w, max_h, base=32):
    """Snap image to multiples of `base` under the max size, rescaling K
    (parity: general_eval.py:92-109)."""
    import cv2
    h, w = img.shape[:2]
    if h > max_h or w > max_w:
        scale = 1.0 * max_h / h
        if scale * w > max_w:
            scale = 1.0 * max_w / w
        new_w, new_h = scale * w // base * base, scale * h // base * base
    else:
        new_w, new_h = 1.0 * w // base * base, 1.0 * h // base * base
    scale_w = 1.0 * new_w / w
    scale_h = 1.0 * new_h / h
    intrinsics = intrinsics.copy()
    intrinsics[0, :] *= scale_w
    intrinsics[1, :] *= scale_h
    img = cv2.resize(img, (int(new_w), int(new_h)))
    return img, intrinsics


class GeneralEvalDataset:
    def __init__(self, datapath, listfile, mode, nviews, ndepths=192,
                 interval_scale=1.06, **kwargs):
        assert mode == "test"
        self.datapath = datapath
        self.listfile = listfile  # list of scan names
        self.nviews = nviews
        self.ndepths = ndepths
        self.max_h = kwargs["max_h"]
        self.max_w = kwargs["max_w"]
        self.fix_res = kwargs.get("fix_res", False)
        self.fix_wh = False
        self.s_h, self.s_w = 0, 0
        if isinstance(interval_scale, float):
            self.interval_scale = {s: interval_scale for s in listfile}
        else:
            self.interval_scale = interval_scale
        self.metas = self._build_list()

    def _build_list(self):
        metas = []
        for scan in self.listfile:
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
        view_ids = [ref_view] + src_views[: self.nviews - 1]

        imgs = []
        proj_matrices = []
        depth_values = None
        intrinsics = None
        for i, vid in enumerate(view_ids):
            img_filename = os.path.join(
                self.datapath, f"{scan}/images_post/{vid:0>8}.jpg")
            if not os.path.exists(img_filename):
                img_filename = os.path.join(
                    self.datapath, f"{scan}/images/{vid:0>8}.jpg")
            cam_filename = os.path.join(self.datapath, f"{scan}/cams/{vid:0>8}_cam.txt")

            img = self._read_img(img_filename)
            intrinsics, extrinsics, depth_min, depth_interval = self._read_cam_file(
                cam_filename, self.interval_scale[scene_name])
            img, intrinsics = scale_mvs_input(img, intrinsics, self.max_w, self.max_h)

            if self.fix_res:
                self.s_h, self.s_w = img.shape[:2]
                self.fix_res = False
                self.fix_wh = True
            if i == 0 and not self.fix_wh:
                self.s_h, self.s_w = img.shape[:2]
            c_h, c_w = img.shape[:2]
            if (c_h, c_w) != (self.s_h, self.s_w):
                import cv2
                intrinsics[0, :] *= 1.0 * self.s_w / c_w
                intrinsics[1, :] *= 1.0 * self.s_h / c_h
                img = cv2.resize(img, (self.s_w, self.s_h))

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
