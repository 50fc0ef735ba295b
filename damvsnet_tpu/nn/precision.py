"""Compute-dtype plumbing for mixed precision.

A trace-time context selects the computation dtype for conv/dense blocks
(params stay fp32; BatchNorm statistics stay fp32; softmax/regression are
pinned fp32 at their call sites). bf16 on TPU doubles MXU throughput and
halves cost-volume HBM traffic.

The context is read when the model is *traced* — it is a static property
of the compiled graph. CascadeMVSNet sets it from its ``compute_dtype``
config field, so different configs produce different traces as expected.
"""
from __future__ import annotations

import contextlib

_COMPUTE_DTYPE = [None]  # None => full fp32 (flax default promotion)


@contextlib.contextmanager
def compute_dtype(dtype):
    """Set the block computation dtype for the enclosed trace."""
    _COMPUTE_DTYPE.append(dtype)
    try:
        yield
    finally:
        _COMPUTE_DTYPE.pop()


def get_compute_dtype():
    return _COMPUTE_DTYPE[-1]
