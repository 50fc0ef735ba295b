"""FMT transplant parity vs the live reference transformer.

Transplants a freshly initialized reference FMT_with_pathway
(/root/reference/models/FMT.py:114-225: LinearAttention, ['self','cross']x4
encoder layers, FPN pathway propagation) into our FMTWithPathway
(nn/fmt.py) via utils.transplant.transplant_fmt_pathway and compares the
full multi-view forward — positional encoding, the 4 self layers on the
reference view, the alternating self/cross layers per source view, and
the dim-reduction + upsample-add + smooth pathway.
"""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from damvsnet_tpu.nn.fmt import FMTWithPathway  # noqa: E402
from damvsnet_tpu.utils.transplant import transplant_fmt_pathway  # noqa: E402

B, NV = 1, 3
H1, W1 = 8, 8  # stage1 (quarter-res) size


def _import_reference_fmt():
    if "utils" not in sys.modules or not hasattr(sys.modules.get("utils"),
                                                 "local_pcd"):
        stub = types.ModuleType("utils")
        stub.local_pcd = lambda *a, **k: None
        sys.modules["utils"] = stub
    sys.path.insert(0, "/root/reference")
    try:
        import models  # noqa: F401 — package context
        from models.FMT import FMT_with_pathway
        return FMT_with_pathway
    finally:
        sys.path.remove("/root/reference")


@pytest.fixture(scope="module")
def fmt_models_and_features():
    FMT_with_pathway = _import_reference_fmt()
    torch.manual_seed(0)
    ref = FMT_with_pathway(base_channels=8)
    ref.eval()

    rs = np.random.default_rng(0)
    feats = []
    for _ in range(NV):
        feats.append({
            "stage1": rs.standard_normal((B, 32, H1, W1)).astype(np.float32),
            "stage2": rs.standard_normal((B, 16, 2 * H1, 2 * W1)).astype(np.float32),
            "stage3": rs.standard_normal((B, 8, 4 * H1, 4 * W1)).astype(np.float32),
        })
    t_feats = [{k: torch.from_numpy(v.copy()) for k, v in f.items()}
               for f in feats]
    with torch.no_grad():
        want = ref(t_feats)

    variables = transplant_fmt_pathway(ref.state_dict())
    ours = FMTWithPathway(base_channels=8)
    j_feats = [{k: jnp.asarray(np.moveaxis(v, 1, -1)) for k, v in f.items()}
               for f in feats]
    got = jax.jit(lambda v, f: ours.apply(v, f))(variables, j_feats)
    return want, got


@pytest.mark.parametrize("view", range(NV))
@pytest.mark.parametrize("stage", ["stage1", "stage2", "stage3"])
def test_fmt_pathway_parity(fmt_models_and_features, view, stage):
    want, got = fmt_models_and_features
    w = want[view][stage].numpy()  # NCHW
    g = np.moveaxis(np.asarray(got[view][stage]), -1, 1)
    np.testing.assert_allclose(g, w, atol=5e-5, rtol=1e-4,
                               err_msg=f"view{view}/{stage}")
