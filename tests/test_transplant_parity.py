"""Full-model numerical parity vs the live reference CascadeMVSNet.

Transplants a freshly initialized (then one-train-step-perturbed, so BN
running statistics are non-trivial) reference torch model's state_dict
into our Flax CascadeMVSNet via utils.transplant and compares complete
forward passes on a synthetic rig. This is the composition-level check
the per-op golden tests can't provide: a stage-handoff resize off-by-one,
a mis-wired skip connection, or a wrong BN stat would all surface here.

Reference: /root/reference/models/cas_mvsnet.py:190-319 (fpn / adaptive /
GeoFeatureFusion configuration, the shipped default).
"""
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from damvsnet_tpu.model import CascadeMVSNet  # noqa: E402
from damvsnet_tpu.utils.transplant import transplant_cascade  # noqa: E402
from conftest import make_rig  # noqa: E402

B, N, H, W, D0 = 1, 3, 32, 32, 16


def _import_reference_cascade():
    """Import the reference CascadeMVSNet with its leftover debug prints
    defused: the forward hard-indexes depth_range_samples[0,:,575,1018]
    (cas_mvsnet.py:275-285), so it cannot run below ~576x1019 images.
    The source is patched in memory only (pixel indices -> [0,:,0,0]);
    /root/reference is never modified."""
    if "utils" not in sys.modules or not hasattr(sys.modules.get("utils"),
                                                 "local_pcd"):
        stub = types.ModuleType("utils")
        stub.local_pcd = lambda *a, **k: None
        sys.modules["utils"] = stub
    sys.path.insert(0, "/root/reference")
    try:
        import models  # noqa: F401 — package context for relative imports
        path = "/root/reference/models/cas_mvsnet.py"
        with open(path) as f:
            src = f.read()
        for idx in ("575,1018", "541,919", "577,961", "33,369", "151,441",
                    "106,390"):
            src = src.replace(f"[0,:,{idx}]", "[0,:,0,0]")
        mod = types.ModuleType("models._cas_mvsnet_parity")
        mod.__package__ = "models"
        mod.__file__ = path
        sys.modules[mod.__name__] = mod
        exec(compile(src, path, "exec"), mod.__dict__)
        return mod.CascadeMVSNet
    finally:
        sys.path.remove("/root/reference")


def _batch(seed=0):
    rs = np.random.default_rng(seed)
    _, projs = make_rig(batch=B, num_views=N, height=H // 4, width=W // 4,
                        seed=seed)
    proj_ms, intr_ms = {}, {}
    for s in range(1, 4):
        p = projs.copy()
        p[:, :, 1, :2, :] *= 2.0 ** (s - 1)
        proj_ms[f"stage{s}"] = p
        intr_ms[f"stage{s}"] = p[:, 0, 1, :3, :3].copy()
    imgs = rs.random((B, N, H, W, 3)).astype(np.float32)
    depth_values = np.linspace(4.0, 8.0, D0, dtype=np.float32)[None].repeat(B, 0)
    return imgs, proj_ms, depth_values, intr_ms


@pytest.fixture(scope="module")
def models_and_batch():
    RefCascade = _import_reference_cascade()
    torch.manual_seed(0)
    ref = RefCascade(ndepths=[8, 8, 8], depth_interals_ratio=[4, 2, 1],
                     cr_base_chs=[8, 8, 8], agg_mode="adaptive")
    imgs, proj_ms, depth_values, intr_ms = _batch()
    t_imgs = torch.from_numpy(imgs).permute(0, 1, 4, 2, 3).contiguous()
    t_projs = {k: torch.from_numpy(v) for k, v in proj_ms.items()}
    t_intr = {k: torch.from_numpy(v) for k, v in intr_ms.items()}
    t_dv = torch.from_numpy(depth_values)

    # perturb BN running stats away from init (0, 1) so the batch_stats
    # transplant is genuinely exercised (a train pass can't run at this
    # tiny size: the U-Net's deepest level is 1x1x1 per channel)
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for name, buf in ref.named_buffers():
            if name.endswith("running_mean"):
                buf.add_(0.05 * torch.randn(buf.shape, generator=gen))
            elif name.endswith("running_var"):
                buf.mul_(1.0 + 0.2 * torch.rand(buf.shape, generator=gen))
    ref.eval()
    with torch.no_grad():
        want = ref(t_imgs, t_projs, t_dv, t_intr)

    variables = transplant_cascade(ref.state_dict())
    model = CascadeMVSNet(ndepths=(8, 8, 8), cr_base_chs=(8, 8, 8),
                          sampler="xla")
    got = model.apply(variables, jnp.asarray(imgs),
                      {k: jnp.asarray(v) for k, v in proj_ms.items()},
                      jnp.asarray(depth_values),
                      {k: jnp.asarray(v) for k, v in intr_ms.items()},
                      train=False)
    return want, got


@pytest.mark.parametrize("stage", ["stage1", "stage2", "stage3"])
def test_full_forward_depth_parity(models_and_batch, stage):
    want, got = models_and_batch
    for key, atol in (("depth", 2e-3), ("photometric_confidence", 2e-3),
                      ("variance", 2e-3)):
        np.testing.assert_allclose(
            np.asarray(got[stage][key]), want[stage][key].numpy(),
            atol=atol, err_msg=f"{stage}/{key}")


def test_full_forward_prob_volume_parity(models_and_batch):
    want, got = models_and_batch
    np.testing.assert_allclose(
        np.asarray(got["stage3"]["prob_volume"]),
        want["stage3"]["prob_volume"].numpy(), atol=2e-3)
