"""Pallas TPU kernels for the hot ops.

Each kernel has an XLA fallback in ops/ (the reference implementation used
on CPU and for differentiation); kernels are opt-in via ops.use_pallas()
or the DAMVSNET_PALLAS=1 environment variable and are only selected on the
TPU backend.
"""
from .probstats import prob_volume_stats_pallas
