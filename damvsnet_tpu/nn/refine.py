"""Residual depth refinement head.

Parity with RefineNet (/root/reference/models/module.py:594-606): four
ConvBnReLU layers on concat(image, initial depth) predicting a depth
residual. (The reference's forward calls the nonexistent ``F.cat`` and is
invoked with a mismatched signature — a dead code path; this implementation
is the evidently-intended behavior.)
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .blocks import Conv2dBlock


class RefineNet(nn.Module):
    @nn.compact
    def __call__(self, img, depth_init, train: bool = False):
        """img [B,H,W,3], depth_init [B,H,W] -> refined depth [B,H,W]."""
        x = jnp.concatenate([img, depth_init[..., None]], axis=-1)
        x = Conv2dBlock(32, 3, 1, padding=1)(x, train)
        x = Conv2dBlock(32, 3, 1, padding=1)(x, train)
        x = Conv2dBlock(32, 3, 1, padding=1)(x, train)
        residual = Conv2dBlock(1, 3, 1, padding=1)(x, train)
        return depth_init + residual[..., 0]
