"""The pjit training/eval step and the epoch-loop Trainer.

Replaces the reference's DDP train loop (train.py:92-260) with a single
jitted SPMD step: params replicated, batch sharded over the mesh's 'data'
axis; GSPMD inserts the gradient all-reduce (the role of DDP/NCCL) and
syncs BN batch statistics across shards for free (apex syncBN equivalent,
train.py:464-470).
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp

from ..losses import cas_mvsnet_loss
from .logging import SummaryWriter
from .metrics import thres_metrics, abs_depth_error_metrics, DictAverageMeter
from .state import TrainState, save_checkpoint, wait_for_saves


def make_train_step(model, dlossw=(0.5, 1.0, 2.0), use_cpc: bool = True,
                    cpc_weight: float = 12.0,
                    mesh=None, donate: bool = True,
                    grad_accum: int = 1) -> Callable:
    """Build the jitted train step: (state, batch) -> (state, metrics).

    grad_accum > 1: the batch's leading axis is split into that many
    microbatches whose gradients are averaged before the update (reference
    has no accumulation — SURVEY §2.7 lists it as the TPU-side extension
    for memory-bound large-batch runs)."""

    def loss_fn(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        outputs, mutated = model.apply(
            variables, batch["imgs"], batch["proj_matrices"],
            batch["depth_values"], batch.get("intrinsics_matrices"),
            train=True, mutable=["batch_stats"])
        total, depth_loss, cpc = cas_mvsnet_loss(
            outputs, batch["imgs"], batch["proj_matrices"], batch["depth"],
            batch["mask"], dlossw=dlossw, cpc_weight=cpc_weight, use_cpc=use_cpc)
        aux = (outputs, mutated["batch_stats"], depth_loss, cpc)
        return total, aux

    def accum_grads(state, batch):
        if grad_accum <= 1:
            return jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, batch)

        def microbatch(mb):
            return jax.tree_util.tree_map(
                lambda x: x.reshape((grad_accum, -1) + x.shape[1:]), mb)

        mbs = microbatch(batch)

        def body(carry, mb):
            acc_grads, acc_loss, bs, _, _ = carry
            (total, (outputs, new_bs, dl, cpc)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, bs, mb)
            acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads, grads)
            return (acc_grads, acc_loss + total, new_bs, dl, cpc), outputs

        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (grads, total, new_bs, dl, cpc), outputs = jax.lax.scan(
            body, (zeros, jnp.float32(0.0), state.batch_stats, 0.0, 0.0), mbs)
        grads = jax.tree_util.tree_map(lambda g: g / grad_accum, grads)
        outputs = jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]), outputs)
        return (total / grad_accum, (outputs, new_bs, dl, cpc)), grads

    def train_step(state: TrainState, batch):
        (total, (outputs, new_bs, depth_loss, cpc)), grads = accum_grads(
            state, batch)
        state = state.apply_gradients(grads, new_batch_stats=new_bs)
        depth_est = outputs["depth"]
        depth_gt = batch["depth"]["stage3"]
        mask = batch["mask"]["stage3"] > 0.5
        metrics = {
            "loss": total,
            "depth_loss": depth_loss,
            "cpc_loss": cpc,
            "abs_depth_error": abs_depth_error_metrics(depth_est, depth_gt, mask),
            "thres2mm_error": thres_metrics(depth_est, depth_gt, mask, 2.0),
            "thres4mm_error": thres_metrics(depth_est, depth_gt, mask, 4.0),
            "thres8mm_error": thres_metrics(depth_est, depth_gt, mask, 8.0),
        }
        # image summaries (first sample; parity: train.py:106-119 +
        # utils.py:83-101 save_images) — lazy device arrays, fetched by the
        # Trainer only at summary steps
        maskf = mask[0].astype(depth_est.dtype)
        metrics["_images"] = {
            "depth_est": depth_est[0] * maskf,
            "depth_gt": depth_gt[0],
            "ref_img": batch["imgs"][0, 0],
            "mask": maskf,
            "errormap": jnp.abs(depth_est[0] - depth_gt[0]) * maskf,
            "photometric_confidence": outputs["photometric_confidence"][0],
        }
        return state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def make_eval_step(model, dlossw=(0.5, 1.0, 2.0)) -> Callable:
    """Validation step (parity with test_sample_depth, train.py:263-342):
    loss + banded threshold/abs-error metrics, no CPC, no grad."""

    def eval_step(state: TrainState, batch):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        outputs = model.apply(
            variables, batch["imgs"], batch["proj_matrices"],
            batch["depth_values"], batch.get("intrinsics_matrices"),
            train=False)
        depth_est = outputs["depth"]
        depth_gt = batch["depth"]["stage3"]
        mask = batch["mask"]["stage3"] > 0.5
        _, depth_loss, _ = cas_mvsnet_loss(
            outputs, batch["imgs"], batch["proj_matrices"], batch["depth"],
            batch["mask"], dlossw=dlossw, use_cpc=False)
        metrics = {
            "depth_loss": depth_loss,
            "abs_depth_error": abs_depth_error_metrics(depth_est, depth_gt, mask),
        }
        for t in (2, 4, 8, 14, 20):
            metrics[f"thres{t}mm_error"] = thres_metrics(depth_est, depth_gt, mask, float(t))
        for lo, hi in ((0, 2.0), (2.0, 4.0), (4.0, 8.0), (8.0, 14.0),
                       (14.0, 20.0), (20.0, 1e5)):
            metrics[f"abserr_{lo}mm_{hi}mm"] = abs_depth_error_metrics(
                depth_est, depth_gt, mask, (lo, hi))
        return metrics, outputs

    return jax.jit(eval_step)


class Trainer:
    """Epoch loop: train -> checkpoint -> eval (parity: train.py:98-172)."""

    def __init__(self, model, state: TrainState, logdir: str,
                 dlossw=(0.5, 1.0, 2.0), use_cpc: bool = True,
                 summary_freq: int = 50, log_fn=print, max_keep=None,
                 save_freq: int = 0):
        self.model = model
        self.state = state
        self.logdir = logdir
        self.train_step = make_train_step(model, dlossw, use_cpc)
        self.eval_step = make_eval_step(model, dlossw)
        self.summary_freq = summary_freq
        self.log_fn = log_fn
        self.max_keep = max_keep
        # save_freq > 0: preemption-safe mid-epoch checkpoints every N
        # steps, written on a background thread with the data cursor
        # (SURVEY §7.2 step 9; beyond reference parity)
        self.save_freq = save_freq
        self.writer = SummaryWriter(logdir)

    def train_epoch(self, batches, skip_batches: int = 0):
        """One epoch. skip_batches: resume point of a mid-epoch
        checkpoint — that many leading batches are consumed without a
        step (the deterministic loader order makes the tail identical to
        the interrupted run's)."""
        meter = DictAverageMeter()
        for i, batch in enumerate(batches):
            if i < skip_batches:
                continue
            t0 = time.time()
            self.state, metrics = self.train_step(self.state, batch)
            if self.save_freq and (i + 1) % self.save_freq == 0:
                save_checkpoint(self.logdir, self.state, cursor=i + 1,
                                background=True, max_keep=2)
            images = metrics.pop("_images", None)
            if (i + 1) % self.summary_freq == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                meter.update(metrics)
                self.writer.add_scalars("train", metrics, int(self.state.step))
                if images is not None:
                    self.writer.add_images("train", images,
                                           int(self.state.step))
                self.log_fn(
                    f"epoch {self.state.epoch} iter {i} "
                    + " ".join(f"{k}={v:.4f}" for k, v in metrics.items())
                    + f" time={time.time() - t0:.3f}s")
            else:
                meter.update({k: float(v) for k, v in metrics.items()})
        # drain pending mid-epoch saves BEFORE the epoch save: the epoch
        # checkpoint must end up newest (latest_checkpoint ranks by
        # mtime), else a straggler step-save would win the next resume
        # and replay this epoch's tail
        wait_for_saves()
        self.state = self.state.replace(epoch=self.state.epoch + 1)
        save_checkpoint(self.logdir, self.state, max_keep=self.max_keep)
        means = meter.mean()
        self.writer.add_scalars("train_epoch", means, int(self.state.step))
        return means

    def eval_epoch(self, batches):
        meter = DictAverageMeter()
        for batch in batches:
            metrics, _ = self.eval_step(self.state, batch)
            meter.update({k: float(v) for k, v in metrics.items()})
        means = meter.mean()
        self.writer.add_scalars("eval", means, int(self.state.step))
        self.log_fn("eval: " + " ".join(f"{k}={v:.4f}" for k, v in means.items()))
        return means
