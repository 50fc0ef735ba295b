"""2-D sinusoidal positional encoding (LoFTR temp_bug_fix variant).

Parity with PositionEncodingSine
(/root/reference/models/position_encoding.py:23-60): positions are 1-based
(cumsum of ones), channel groups of 4 carry (sin x, cos x, sin y, cos y)
with div_term = exp(arange(0, d/2, 2) * (-ln 1e4 / (d/2))).

Computed on the fly for the actual (H, W) instead of slicing a 600x600
buffer — identical values, shape [H, W, C] (channels last).
"""
from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=8)
def _pe_np(d_model: int, h: int, w: int) -> np.ndarray:
    pe = np.zeros((h, w, d_model), dtype=np.float32)
    y_pos = np.arange(1, h + 1, dtype=np.float32)[:, None]
    x_pos = np.arange(1, w + 1, dtype=np.float32)[None, :]
    div = np.exp(np.arange(0, d_model // 2, 2, dtype=np.float32)
                 * (-math.log(10000.0) / (d_model // 2)))
    for k, dv in enumerate(div):
        pe[:, :, 4 * k + 0] = np.sin(x_pos * dv)
        pe[:, :, 4 * k + 1] = np.cos(x_pos * dv)
        pe[:, :, 4 * k + 2] = np.sin(y_pos * dv)
        pe[:, :, 4 * k + 3] = np.cos(y_pos * dv)
    return pe


def sine_position_encoding(x: jnp.ndarray) -> jnp.ndarray:
    """x: [B, H, W, C] -> x + PE (broadcast over batch)."""
    b, h, w, c = x.shape
    pe = jnp.asarray(_pe_np(c, h, w), dtype=x.dtype)
    return x + pe[None]
