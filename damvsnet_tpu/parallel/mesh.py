"""Device mesh + sharding helpers (the TPU-native replacement for the
reference's DDP/NCCL runtime, train.py:401-479).

Design (scaling-book recipe): pick a mesh, annotate shardings on the
inputs/params, let XLA GSPMD insert the collectives.

Axes:
  * "data"  — batch / work-item parallelism (maps to the reference's DDP).
    Gradients are reduced over it automatically by GSPMD when params are
    replicated and the batch is sharded.
  * "space" — spatial sharding of the image/cost-volume H axis for
    single-sample scale-out (halo exchange for convs is inserted by GSPMD).
    This is the TPU analog of the reference's absent sequence parallelism:
    the cost volume's (D, H, W) extent is the long axis here (SURVEY §5).

Under a single device everything degrades to no-op shardings.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshAxes:
    data: str = "data"
    space: str = "space"


def maybe_initialize_distributed():
    """Multi-host rendezvous (the reference's torchrun env:// NCCL init,
    train.py:401-405), via ``jax.distributed.initialize``.

    Resolution order:
      1. ``JAX_COORDINATOR_ADDRESS`` [+ ``JAX_NUM_PROCESSES`` /
         ``JAX_PROCESS_ID``] set -> explicit initialize with those values
         (the standard manual configuration of
         ``jax.distributed.initialize``'s parameters).
      2. A supported cluster environment (TPU pod metadata, Slurm, Open
         MPI, GKE) -> bare ``initialize()`` auto-detection.
      3. Otherwise single-process: no-op.

    Idempotent: a second call (or one after the caller already
    initialized) is a no-op. Exercised by the 2-process CPU test in
    tests/test_multiprocess.py."""
    import os
    already = getattr(jax._src.distributed.global_state, "client", None)
    if already is not None:
        return jax.process_index(), jax.process_count()
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        nproc = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=None if nproc is None else int(nproc),
            process_id=None if pid is None else int(pid))
    else:
        try:
            from jax._src.clusters import ClusterEnv
            detected = ClusterEnv.auto_detect_unset_distributed_params(
                None, None, None, None, None, None)[0] is not None
        except Exception:
            detected = False
        if detected:
            jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


def shard_work_items(items, process_index: int | None = None,
                     process_count: int | None = None):
    """Scan/ref-view work-item sharding across hosts for inference
    (SURVEY §2.7 "scan-parallel"): host i takes items[i::n]."""
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    return list(items)[process_index::process_count]


def make_mesh(data: int | None = None, space: int = 1,
              devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Create a ('data', 'space') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // space
    assert data * space == n, f"{data}x{space} != {n} devices"
    arr = np.asarray(devices).reshape(data, space)
    return Mesh(arr, ("data", "space"))


def batch_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0,
                   space_axis: int | None = None) -> NamedSharding:
    """Shard `batch_axis` over 'data' (and optionally one axis over 'space')."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    if space_axis is not None and mesh.shape["space"] > 1:
        spec[space_axis] = "space"
    return NamedSharding(mesh, P(*spec))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def active_mesh():
    """The mesh governing the current trace, or None.

    Checks the public ``jax.set_mesh`` context first
    (``jax.sharding.get_abstract_mesh`` — safe both inside and outside jit
    traces, unlike ``get_mesh``), then the legacy ``with mesh:`` context
    (private ``thread_resources`` — wrapped so a JAX upgrade that removes
    it degrades to public-context-only instead of crashing)."""
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is not None and getattr(mesh, "empty", True) is False:
        return mesh
    try:
        from jax.interpreters.pxla import thread_resources
        mesh = thread_resources.env.physical_mesh
        if not mesh.empty:
            return mesh
    except Exception:
        pass
    return None


_WARNED_AXES: set = set()


def mesh_axis_size(axis: str, warn_context: str | None = None) -> int:
    """Size of `axis` on the active mesh (1 if absent). When the caller
    explicitly requested the axis but no active mesh carries it, the
    silent fallback to unsharded execution is surfaced with one warning
    per (context, axis)."""
    mesh = active_mesh()
    size = dict(mesh.shape).get(axis, 1) if mesh is not None else 1
    if size <= 1 and warn_context and (warn_context, axis) not in _WARNED_AXES:
        _WARNED_AXES.add((warn_context, axis))
        import warnings
        warnings.warn(
            f"{warn_context}: mesh axis '{axis}' requested but the current "
            "trace has no active mesh carrying it (enter `with mesh:` or "
            "`jax.set_mesh(mesh)`) — running unsharded", stacklevel=3)
    return size


def slab_constraint(x, axis: str | None, dim: int = 1,
                    data_axis: str = "data"):
    """Depth-slab sharding constraint for cost volumes / U-Net levels.

    Shards x's depth-hypothesis dim over `axis` whenever it divides
    (1-slab shards keep halo convs near-bitwise); at D == 1 (the stride-2
    ladder's bottleneck level) it shards the CHANNEL dim over the axis
    instead. Rationale, found by bisecting on the 8-device CPU mesh
    (scripts/repro_slab.py):

    * r3 pinned non-shardable D to explicit replication -> GSPMD
      converted batch-sharded producers via "involuntary full
      rematerialization" (MULTICHIP_r03.json tail).
    * Leaving bottleneck levels unconstrained still warned: the
      transposed-conv partitioner wants its input (batch-replicated,
      D-space-sharded) and the batch-sharded producer can't get there.
    * Channel-sharding the bottleneck gives every level a valid 'space'
      placement; D<->C transitions are all-to-alls GSPMD plans natively,
      and the deconv partitions its contraction dim (psum). Result:
      warning-free (MULTICHIP_r04), gradient parity preserved.

    The batch dim is pinned to 'data' whenever shardable; remaining dims
    stay UNCONSTRAINED — pinning them to None would force batch
    replication, which scales gradients by the data-axis size
    (reproduced: exactly 4x on a data=4 mesh; tests/test_parallel.py)."""
    if axis is None:
        return x
    size = mesh_axis_size(axis, warn_context="slab_constraint")
    if size <= 1:
        return x
    spec = [P.UNCONSTRAINED] * x.ndim
    # pin the batch dim to 'data' whenever it is shardable: leaving it
    # unconstrained lets GSPMD alternate batch-sharded producers with
    # depth-sharded constraint targets, and THAT conversion is what falls
    # back to involuntary full rematerialization (MULTICHIP_r03 tail)
    mesh = active_mesh()
    data_size = dict(mesh.shape).get(data_axis, 1) if mesh is not None else 1
    if dim != 0 and data_size > 1 and x.shape[0] % data_size == 0:
        spec[0] = data_axis
    # D-shard while divisible (window-dim halo, no reduction split ->
    # near-bitwise vs unsharded); at the D=1 bottleneck shard C instead
    # (contraction psum — reassociates, but only one tiny level).
    if x.shape[dim] % size == 0 and x.shape[dim] >= size:
        spec[dim] = axis
    elif x.shape[-1] % size == 0:
        spec[-1] = axis
    else:
        # neither D nor C divides the axis: falling through unconstrained
        # reintroduces exactly the r3 involuntary-rematerialization risk
        # this helper exists to prevent — surface it once per shape
        key = ("slab_fallthrough", axis, x.shape[dim], x.shape[-1], size)
        if key not in _WARNED_AXES:
            _WARNED_AXES.add(key)
            import warnings
            warnings.warn(
                f"slab_constraint: neither dim {dim} (={x.shape[dim]}) nor "
                f"the channel dim (={x.shape[-1]}) divides mesh axis "
                f"'{axis}' (size {size}) — leaving the volume unconstrained;"
                " GSPMD may fall back to full rematerialization. Pick D/C "
                "multiples of the slab axis.", stacklevel=3)
        return x
    if all(s is P.UNCONSTRAINED for s in spec):
        return x
    return jax.lax.with_sharding_constraint(x, P(*spec))


def shard_batch(mesh: Mesh, batch, space_axes: dict | None = None):
    """Place a pytree batch on the mesh: leading axis over 'data'.

    space_axes: optional {key_path_leaf_name: axis} to additionally shard a
    spatial axis over 'space' (used for high-res inference).
    """
    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, batch_sharding(mesh, x.ndim))
        return jax.device_put(x, replicate_sharding(mesh))

    return jax.tree_util.tree_map(place, batch)
