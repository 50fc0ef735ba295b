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

import flax.linen as nn
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


class PositionEncodingSuperGlue(nn.Module):
    """SuperGlue MLP keypoint encoder alternative (parity:
    models/position_encoding.py:6-20,87-97): normalized (x, y) pixel
    positions -> MLP [2, 32, 64, C] (1x1 convs + BN + ReLU) added to the
    feature map. Higher memory than the sine PE; kept as a config option."""
    d_model: int = 32

    def _mlp(self, x, train):
        for i, ch in enumerate([32, 64]):
            x = nn.Conv(ch, (1,), name=f"mlp{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"bn{i}")(x)
            x = nn.relu(x)
        return nn.Conv(self.d_model, (1,), name="mlp_out",
                       bias_init=nn.initializers.zeros)(x)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        ys = jnp.arange(1, h + 1, dtype=x.dtype)
        xs = jnp.arange(1, w + 1, dtype=x.dtype)
        gx, gy = jnp.meshgrid(xs, ys)  # [h, w] each, 1-based
        kpts = jnp.stack([gx - 1, gy - 1], axis=-1).reshape(1, h * w, 2)
        # normalize_keypoints (position_encoding.py:77-84)
        size = jnp.asarray([w, h], dtype=x.dtype)
        center = size / 2
        scaling = jnp.max(size) * 0.7
        kpts = (kpts - center) / scaling
        enc = self._mlp(jnp.broadcast_to(kpts, (b, h * w, 2)), train)
        return x + enc.reshape(b, h, w, self.d_model)
