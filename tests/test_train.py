"""End-to-end training smoke tests (tiny model, synthetic data)."""
import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from damvsnet_tpu.model import CascadeMVSNet
from damvsnet_tpu.data.synthetic import SyntheticDataset
from damvsnet_tpu.data.common import DataLoader
from damvsnet_tpu.train.loop import make_train_step, make_eval_step
from damvsnet_tpu.train.state import (create_train_state, save_checkpoint,
                                      restore_checkpoint, latest_checkpoint)


@pytest.fixture(scope="module")
def tiny_setup():
    model = CascadeMVSNet(ndepths=(8, 8, 8), use_geo_fusion=False)
    ds = SyntheticDataset(height=32, width=32, length=4, ndepths=16, nviews=3)
    loader = DataLoader(ds, batch_size=2, num_workers=0)
    batch = next(iter(loader))
    batch.pop("filename", None)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    tx = optax.adam(1e-3)
    state = create_train_state(model, jax.random.PRNGKey(0), batch, tx)
    return model, state, batch


@pytest.mark.slow
def test_train_step_updates_params(tiny_setup):
    model, state, batch = tiny_setup
    step = make_train_step(model, use_cpc=True, donate=False)
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["depth_loss"]))
    assert np.isfinite(float(metrics["cpc_loss"]))
    assert new_state.step == state.step + 1
    # params must actually move
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0


@pytest.mark.slow
def test_fixed_seed_regression(tiny_setup):
    """One train step from a fixed seed is deterministic (regression anchor,
    SURVEY §4 test-pyramid requirement)."""
    model, state, batch = tiny_setup
    step = make_train_step(model, use_cpc=False, donate=False)
    _, m1 = step(state, batch)
    _, m2 = step(state, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)


@pytest.mark.slow
def test_eval_step(tiny_setup):
    model, state, batch = tiny_setup
    estep = make_eval_step(model)
    metrics, outputs = estep(state, batch)
    assert np.isfinite(float(metrics["depth_loss"]))
    assert "thres2mm_error" in metrics and "abserr_0mm_2.0mm" in metrics
    assert outputs["depth"].shape == batch["depth"]["stage3"].shape


def test_checkpoint_roundtrip(tiny_setup, tmp_path):
    model, state, _ = tiny_setup
    state = state.replace(epoch=3, step=120)
    path = save_checkpoint(str(tmp_path), state)
    assert latest_checkpoint(str(tmp_path)) == path

    blank = state.replace(
        epoch=0, step=0,
        params=jax.tree_util.tree_map(jnp.zeros_like, state.params))
    restored = restore_checkpoint(path, blank)
    assert restored.epoch == 3 and restored.step == 120
    ok = jax.tree_util.tree_map(
        lambda a, b: bool(jnp.allclose(a, b)), restored.params, state.params)
    assert all(jax.tree_util.tree_leaves(ok))

    weights_only = restore_checkpoint(path, blank, weights_only=True)
    assert weights_only.epoch == 0 and weights_only.step == 0


@pytest.mark.slow
def test_kill_and_resume_mid_epoch(tiny_setup, tmp_path):
    """Preemption-safe checkpointing: a run killed mid-epoch resumes from
    the step checkpoint (with its data cursor) and ends bit-identical to
    an uninterrupted run over the same deterministic batch stream."""
    from damvsnet_tpu.train.state import wait_for_saves

    model, state0, batch = tiny_setup
    step = make_train_step(model, use_cpc=False, donate=False)
    # 4-batch "epoch": perturb images per batch so steps differ
    batches = [
        {**batch, "imgs": batch["imgs"] + 0.01 * k} for k in range(4)
    ]

    # uninterrupted run
    ref = state0
    for b in batches:
        ref, _ = step(ref, b)

    # interrupted run: 2 steps, mid-epoch save (cursor=2), "kill"
    logdir = str(tmp_path / "killrun")
    os.makedirs(logdir)
    cur = state0
    for b in batches[:2]:
        cur, _ = step(cur, b)
    save_checkpoint(logdir, cur, cursor=2, background=True)
    wait_for_saves()
    del cur

    # resume: fresh state, restore newest ckpt + cursor, skip, finish
    ckpt = latest_checkpoint(logdir)
    assert ckpt and "ckpt_step_" in ckpt
    resumed, cursor = restore_checkpoint(ckpt, state0, with_cursor=True)
    assert cursor == 2 and resumed.step == state0.step + 2
    for b in batches[cursor:]:
        resumed, _ = step(resumed, b)

    assert resumed.step == ref.step
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), ref.params, resumed.params)
    assert max(jax.tree_util.tree_leaves(diff)) == 0.0


def test_epoch_ckpt_outranks_stale_step_ckpt(tiny_setup, tmp_path):
    """latest_checkpoint must prefer the newest save regardless of kind."""
    model, state, _ = tiny_setup
    logdir = str(tmp_path)
    save_checkpoint(logdir, state.replace(step=5, epoch=0), cursor=5)
    path_epoch = save_checkpoint(logdir, state.replace(step=8, epoch=1))
    assert latest_checkpoint(logdir) == path_epoch
