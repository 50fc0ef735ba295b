"""Train state + checkpointing.

Checkpoint semantics parity with the reference (train.py:130-137, 443-457):
one checkpoint per epoch carrying {model, optimizer, epoch}; ``resume``
restores the newest checkpoint in the log dir; ``loadckpt`` restores model
weights only. Implemented on orbax (multi-host-safe, async-capable).

TPU-native extension beyond the reference (SURVEY §7.2 step 9 hardening):
preemption-safe MID-EPOCH checkpoints — ``save_checkpoint(..., cursor=k)``
writes a step-tagged checkpoint carrying the data cursor (batches already
consumed this epoch), optionally on a background thread so the train loop
never blocks on host IO; ``latest_checkpoint`` ranks epoch- and step-
checkpoints together and ``restore_checkpoint(..., with_cursor=True)``
returns the cursor so the loader can skip to the interruption point.
Kill-and-resume covered by tests/test_train.py.
"""
from __future__ import annotations

import os
import re
import threading
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


def _step_ckpt_dir(logdir: str, step: int) -> str:
    return os.path.abspath(os.path.join(logdir, f"ckpt_step_{step:09d}"))


_PENDING_SAVES: list = []


def wait_for_saves():
    """Block until all async checkpoint saves issued so far complete."""
    while _PENDING_SAVES:
        _PENDING_SAVES.pop().join()


def save_checkpoint(logdir: str, state: TrainState,
                    max_keep: int | None = None, cursor: int | None = None,
                    background: bool = False):
    """Save {params, batch_stats, opt_state, step, epoch} (+ cursor).

    cursor=None: the per-epoch checkpoint (reference parity,
    train.py:130-137). cursor=k: a preemption-safe MID-epoch checkpoint
    named by global step, recording that k batches of epoch `state.epoch`
    were already consumed (the deterministic loader order makes the tail
    reproducible on resume).

    background=True: fetch the (small) payload to host synchronously,
    write on a daemon thread — the caller's next step overlaps the IO.
    Call wait_for_saves() before reading the files back.

    max_keep: optional rotation — delete oldest checkpoints of the same
    kind beyond this count (utilsme/io_utils.py:157-191 semantics).
    """
    step_tagged = cursor is not None
    path = (_step_ckpt_dir(logdir, int(state.step)) if step_tagged
            else _ckpt_dir(logdir, state.epoch))
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
        "epoch": int(state.epoch),
    }
    pattern = r"ckpt_step_\d{9}" if step_tagged else r"ckpt_\d{6}"

    def write():
        ocp.PyTreeCheckpointer().save(path, payload, force=True)
        if step_tagged:
            # cursor sidecar (outside the orbax dir so the payload tree
            # structure stays identical across checkpoint kinds)
            with open(path + ".cursor", "w") as f:
                f.write(str(int(cursor)))
        if max_keep is not None:
            import shutil
            cands = sorted(d for d in os.listdir(logdir)
                           if re.fullmatch(pattern, d))
            for stale in cands[:-max_keep]:
                shutil.rmtree(os.path.join(logdir, stale), ignore_errors=True)
                try:
                    os.remove(os.path.join(logdir, stale + ".cursor"))
                except OSError:
                    pass

    if background:
        t = threading.Thread(target=write, daemon=True)
        t.start()
        _PENDING_SAVES.append(t)
    else:
        write()
    return path


def latest_checkpoint(logdir: str) -> str | None:
    """Newest checkpoint in logdir — epoch- and step-tagged ranked
    together by modification time (a mid-epoch save is newer than the
    last epoch save it follows)."""
    if not os.path.isdir(logdir):
        return None
    cands = [d for d in os.listdir(logdir)
             if re.fullmatch(r"ckpt_\d{6}|ckpt_step_\d{9}", d)]
    if not cands:
        return None
    return os.path.join(
        logdir, max(cands, key=lambda d: os.path.getmtime(
            os.path.join(logdir, d))))


def restore_checkpoint(path: str, state: TrainState,
                       weights_only: bool = False,
                       with_cursor: bool = False):
    """Restore a checkpoint into `state`. weights_only mirrors --loadckpt.
    with_cursor=True additionally returns the mid-epoch data cursor
    (0 for per-epoch checkpoints).

    Restores against `state`'s own tree as the structure template so
    optax's NamedTuple opt-state containers survive the round trip
    (a bare orbax restore returns plain dicts)."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if weights_only:
        # raw restore: params/batch_stats are plain dicts anyway, and the
        # checkpoint's optimizer (ignored here) may differ structurally
        # from state's (e.g. finetuning with a different schedule)
        payload = ckptr.restore(path)
    else:
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": 0,
            "epoch": 0,
        }
        payload = ckptr.restore(path, item=template)
    state = state.replace(params=payload["params"],
                          batch_stats=payload["batch_stats"])
    if not weights_only:
        state = state.replace(opt_state=payload["opt_state"],
                              step=int(payload["step"]),
                              epoch=int(payload["epoch"]))
    if with_cursor:
        cursor = 0
        if os.path.exists(path + ".cursor"):
            with open(path + ".cursor") as f:
                cursor = int(f.read().strip() or 0)
        return state, cursor
    return state
