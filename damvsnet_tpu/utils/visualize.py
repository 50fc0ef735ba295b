"""Depth-map pseudo-color visualization (capability parity with
/root/reference/visualize.py — pseudo-color PNG export of PFM depth maps)."""
from __future__ import annotations

import numpy as np


def depth_to_color(depth: np.ndarray, dmin=None, dmax=None,
                   invalid_mask=None) -> np.ndarray:
    """Depth [H, W] -> uint8 RGB [H, W, 3] (jet-like colormap; invalid
    pixels black)."""
    d = np.asarray(depth, dtype=np.float64)
    if invalid_mask is None:
        invalid_mask = ~np.isfinite(d) | (d <= 0)
    valid = ~invalid_mask
    if dmin is None:
        dmin = d[valid].min() if valid.any() else 0.0
    if dmax is None:
        dmax = d[valid].max() if valid.any() else 1.0
    x = np.clip((d - dmin) / max(dmax - dmin, 1e-9), 0, 1)
    # piecewise jet
    r = np.clip(1.5 - np.abs(4 * x - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * x - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * x - 1), 0, 1)
    rgb = (np.stack([r, g, b], axis=-1) * 255).astype(np.uint8)
    rgb[invalid_mask] = 0
    return rgb


def save_depth_png(path, depth, dmin=None, dmax=None):
    from PIL import Image
    Image.fromarray(depth_to_color(depth, dmin, dmax)).save(path)
