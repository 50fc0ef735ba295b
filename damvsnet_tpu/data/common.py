"""Shared data utilities: collation, a host-side loader with background
prefetch (the role of torch DataLoader workers, train.py:509-512), and the
BlendedMVS photometric augmentations.

Samples are dicts of numpy arrays in NHWC; collate stacks a leading batch
axis (fixed shapes per batch — XLA-friendly).
"""
from __future__ import annotations

import concurrent.futures as cf
import queue
import threading
from typing import Iterable, Iterator, Sequence

import numpy as np


def collate(samples: Sequence[dict]) -> dict:
    """Stack a list of sample dicts into one batch dict (recurses dicts)."""
    first = samples[0]
    out = {}
    for k, v in first.items():
        if isinstance(v, dict):
            out[k] = collate([s[k] for s in samples])
        elif isinstance(v, np.ndarray):
            out[k] = np.stack([s[k] for s in samples])
        elif isinstance(v, (int, float, np.floating, np.integer)):
            out[k] = np.asarray([s[k] for s in samples])
        else:  # strings (filenames) etc.
            out[k] = [s[k] for s in samples]
    return out


class DataLoader:
    """Minimal host loader: shuffling, batching, threaded prefetch.

    drop_last is always True for training (static shapes); for eval use
    batch_size that divides the dataset or pad upstream.
    """

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 seed: int = 0, num_workers: int = 4, drop_last: bool = True,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rs = np.random.default_rng(self.seed + self.epoch)
            rs.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[dict]:
        idx = self._indices()
        nb = len(self)
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]
        self.epoch += 1
        if self.num_workers <= 0:
            for b in batches:
                yield collate([self.dataset[int(i)] for i in b])
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with cf.ThreadPoolExecutor(self.num_workers) as pool:
                for b in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__, b.tolist()))
                    q.put(collate(samples))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()


# ------------------------- augmentations (BlendedMVS train) ----------------


def color_jitter(img: np.ndarray, rs: np.random.Generator,
                 brightness: float = 0.25, contrast=(0.3, 1.5)) -> np.ndarray:
    """torchvision ColorJitter(brightness=0.25, contrast=(0.3, 1.5)) on a
    float [0, 255] HWC image (parity: datasets/blendedmvs.py:52)."""
    ops = []
    b = rs.uniform(max(0.0, 1 - brightness), 1 + brightness)
    ops.append(lambda x: np.clip(x * b, 0, 255))
    c = rs.uniform(*contrast)
    ops.append(lambda x: np.clip(
        c * x + (1 - c) * (0.299 * x[..., 0] + 0.587 * x[..., 1]
                           + 0.114 * x[..., 2]).mean(), 0, 255))
    order = rs.permutation(len(ops))
    for i in order:
        img = ops[i](img)
    return img


def motion_blur(img: np.ndarray, rs: np.random.Generator,
                max_kernel_size: int = 3) -> np.ndarray:
    """Random directional Gaussian-weighted blur
    (parity: datasets/blendedmvs.py:17-37)."""
    import cv2
    mode = rs.choice(["h", "v", "diag_down", "diag_up"])
    ksize = int(rs.integers(0, (max_kernel_size + 1) // 2)) * 2 + 1
    center = (ksize - 1) // 2
    kernel = np.zeros((ksize, ksize))
    if mode == "h":
        kernel[center, :] = 1.0
    elif mode == "v":
        kernel[:, center] = 1.0
    elif mode == "diag_down":
        kernel = np.eye(ksize)
    else:
        kernel = np.flip(np.eye(ksize), 0)
    var = ksize * ksize / 16.0
    grid = np.repeat(np.arange(ksize)[:, None], ksize, axis=-1)
    gaussian = np.exp(-(np.square(grid - center) + np.square(grid.T - center))
                      / (2.0 * var))
    kernel = kernel * gaussian
    kernel /= kernel.sum()
    return cv2.filter2D(img, -1, kernel)
