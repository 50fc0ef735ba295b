"""LR schedule: linear warmup + multi-step decay.

Parity with WarmupMultiStepLR (/root/reference/utils.py:208-252) and the
training recipe (train.py:93-96): 500-iteration linear warmup from
warmup_factor=1/3 to 1, then lr *= gamma at each milestone iteration.
Milestones are given in epochs via the "10,12,14:2" syntax (gamma = 1/2).
"""
from __future__ import annotations

import optax


def parse_lr_epochs(lrepochs: str):
    """'10,12,14:2' -> ([10, 12, 14], 0.5) (parity: train.py:93-95)."""
    milestones_str, gamma_str = lrepochs.split(":")
    milestones = [int(x) for x in milestones_str.split(",") if x]
    gamma = 1.0 / float(gamma_str)
    return milestones, gamma


def warmup_multistep_schedule(base_lr: float, milestones_iters, gamma: float,
                              warmup_iters: int = 500,
                              warmup_factor: float = 1.0 / 3):
    """optax schedule: step -> lr."""
    milestones_iters = sorted(milestones_iters)

    def schedule(step):
        import jax.numpy as jnp
        step = jnp.asarray(step)
        alpha = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
        warmup = warmup_factor * (1.0 - alpha) + alpha
        decay_power = sum((step >= m).astype(jnp.float32) for m in milestones_iters)
        return base_lr * warmup * (gamma ** decay_power)

    return schedule


def make_optimizer(base_lr: float, lrepochs: str, iters_per_epoch: int,
                   weight_decay: float = 0.0, warmup_iters: int = 500):
    """Adam with the reference recipe (train.py:439: betas 0.9/0.999, wd)."""
    milestones, gamma = parse_lr_epochs(lrepochs)
    sched = warmup_multistep_schedule(
        base_lr, [m * iters_per_epoch for m in milestones], gamma, warmup_iters)
    if weight_decay:
        return optax.adamw(sched, weight_decay=weight_decay), sched
    return optax.adam(sched), sched
