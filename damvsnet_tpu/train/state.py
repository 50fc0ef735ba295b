"""Train state + checkpointing.

Checkpoint semantics parity with the reference (train.py:130-137, 443-457):
one checkpoint per epoch carrying {model, optimizer, epoch}; ``resume``
restores the newest checkpoint in the log dir; ``loadckpt`` restores model
weights only. Implemented on orbax (multi-host-safe, async-capable).
"""
from __future__ import annotations

import os
import re
from typing import Any

import flax
import jax
import optax
import orbax.checkpoint as ocp


@flax.struct.dataclass
class TrainState:
    step: int
    epoch: int
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=(self.batch_stats if new_batch_stats is None
                         else new_batch_stats),
        )


def create_train_state(model, rng, example_batch, tx) -> TrainState:
    # jit the init: eager flax init dispatches thousands of tiny ops, which
    # is pathological over a remote-attached TPU (one tunnel roundtrip per
    # op); one compiled program instead.
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, example_batch["imgs"], example_batch["proj_matrices"],
        example_batch["depth_values"],
        example_batch.get("intrinsics_matrices"), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=0, epoch=0, params=params, batch_stats=batch_stats,
        opt_state=tx.init(params), tx=tx)


def _ckpt_dir(logdir: str, epoch: int) -> str:
    return os.path.abspath(os.path.join(logdir, f"ckpt_{epoch:06d}"))


def save_checkpoint(logdir: str, state: TrainState, max_keep: int | None = None):
    """Save {params, batch_stats, opt_state, step, epoch} for this epoch.

    max_keep: optional rotation — delete oldest checkpoints beyond this
    count (the utilsme/io_utils.py:157-191 save_model semantics).
    """
    path = _ckpt_dir(logdir, state.epoch)
    ckptr = ocp.PyTreeCheckpointer()
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
        "epoch": int(state.epoch),
    }
    ckptr.save(path, payload, force=True)
    if max_keep is not None:
        import shutil
        cands = sorted(d for d in os.listdir(logdir)
                       if re.fullmatch(r"ckpt_\d{6}", d))
        for stale in cands[:-max_keep]:
            shutil.rmtree(os.path.join(logdir, stale), ignore_errors=True)
    return path


def latest_checkpoint(logdir: str) -> str | None:
    if not os.path.isdir(logdir):
        return None
    cands = [d for d in os.listdir(logdir) if re.fullmatch(r"ckpt_\d{6}", d)]
    if not cands:
        return None
    return os.path.join(logdir, sorted(cands)[-1])


def restore_checkpoint(path: str, state: TrainState,
                       weights_only: bool = False) -> TrainState:
    """Restore a checkpoint into `state`. weights_only mirrors --loadckpt."""
    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(os.path.abspath(path))
    state = state.replace(params=payload["params"],
                          batch_stats=payload["batch_stats"])
    if not weights_only:
        state = state.replace(opt_state=payload["opt_state"],
                              step=int(payload["step"]),
                              epoch=int(payload["epoch"]))
    return state
