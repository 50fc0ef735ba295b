"""Multi-device tests on the 8-device virtual CPU mesh: sharded train step,
DP gradient equivalence, and the graft entry points."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_mesh_construction():
    from damvsnet_tpu.parallel import make_mesh
    mesh = make_mesh()
    assert mesh.shape["data"] * mesh.shape["space"] == len(jax.devices())
    mesh2 = make_mesh(data=4, space=2)
    assert mesh2.shape == {"data": 4, "space": 2}


def test_schedule_parity():
    """Warmup-multistep schedule matches the reference recipe values."""
    from damvsnet_tpu.train.schedule import (warmup_multistep_schedule,
                                             parse_lr_epochs)
    ms, gamma = parse_lr_epochs("10,12,14:2")
    assert ms == [10, 12, 14] and gamma == 0.5
    sched = warmup_multistep_schedule(1e-3, [1000, 1200, 1400], 0.5,
                                      warmup_iters=500)
    np.testing.assert_allclose(float(sched(0)), 1e-3 / 3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(250)), 1e-3 * (1 / 3 + 1 / 3), rtol=1e-6)
    np.testing.assert_allclose(float(sched(500)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(999)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(1000)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(1400)), 1.25e-4, rtol=1e-6)


def test_metrics():
    from damvsnet_tpu.train.metrics import (thres_metrics,
                                            abs_depth_error_metrics,
                                            DictAverageMeter)
    est = jnp.asarray([[[1.0, 2.0], [3.0, 4.0]]])
    gt = jnp.asarray([[[1.0, 5.0], [3.0, 4.0]]])
    mask = jnp.ones((1, 2, 2), bool)
    np.testing.assert_allclose(float(thres_metrics(est, gt, mask, 2.0)), 0.25)
    np.testing.assert_allclose(
        float(abs_depth_error_metrics(est, gt, mask)), 0.75)
    m = DictAverageMeter()
    m.update({"a": 1.0})
    m.update({"a": 3.0})
    assert m.mean()["a"] == 2.0


@pytest.mark.slow
def test_dryrun_multichip():
    """The driver's multi-chip dry run must work on the virtual mesh."""
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(len(jax.devices()))


@pytest.mark.slow
def test_dp_gradient_equivalence():
    """Gradients from the GSPMD data-sharded step equal single-device
    gradients on the same batch (the correctness contract DDP provides in
    the reference, train.py:472-479)."""
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _example_batch
    from damvsnet_tpu.losses import cas_mvsnet_loss
    from damvsnet_tpu.model import CascadeMVSNet
    from damvsnet_tpu.parallel import make_mesh, shard_batch
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = len(jax.devices())
    model = CascadeMVSNet(ndepths=(4, 4, 4), use_geo_fusion=True)
    batch = _example_batch(batch=n, nviews=2, height=16, width=16, d0=8)
    variables = model.init(
        jax.random.PRNGKey(0), batch["imgs"], batch["proj_matrices"],
        batch["depth_values"], batch["intrinsics_matrices"], train=False)

    def grad_fn(params, batch):
        def loss_fn(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                batch["imgs"], batch["proj_matrices"], batch["depth_values"],
                batch["intrinsics_matrices"], train=True,
                mutable=["batch_stats"])
            total, _, _ = cas_mvsnet_loss(out, batch["imgs"],
                                          batch["proj_matrices"],
                                          batch["depth"], batch["mask"])
            return total
        return jax.grad(loss_fn)(params)

    g_single = jax.jit(grad_fn)(variables["params"], batch)

    mesh = make_mesh(data=n, space=1)
    with mesh:
        params_repl = jax.device_put(variables["params"],
                                     NamedSharding(mesh, P()))
        g_sharded = jax.jit(grad_fn)(params_repl, shard_batch(mesh, batch))

    flat_s, _ = jax.tree_util.tree_flatten(g_single)
    flat_m, _ = jax.tree_util.tree_flatten(g_sharded)
    for a, b in zip(flat_s, flat_m):
        scale = max(float(jnp.abs(a).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   atol=5e-5)
