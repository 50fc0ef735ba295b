"""Tests for the secondary component inventory: Hourglass3d, the alternate
weight net, GeoRegNet2d cascade variant, SuperGlue PE, unsupervised losses,
Sobel edges, summary writer, checkpoint rotation."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import make_rig


def test_hourglass3d_shapes(rng):
    from damvsnet_tpu.nn.blocks import Hourglass3d
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 4)).astype(np.float32))
    m = Hourglass3d(channels=4)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == x.shape


def test_aggweightnet2_shapes(rng):
    from damvsnet_tpu.nn.aggweight import AggWeightNetVolume2
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 16)).astype(np.float32))
    m = AggWeightNetVolume2()
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 4, 8, 8, 1)
    assert (np.asarray(y) >= 0).all()  # ReLU tail


@pytest.mark.slow
def test_georeg_cascade_variant(rng):
    """The prob-volume-embedding regularizer variant
    (cas_mvsnet_embeddingProbVolme parity)."""
    from damvsnet_tpu.model import CascadeMVSNet
    B, N, H, W = 1, 3, 32, 32
    _, projs = make_rig(batch=B, num_views=N, height=H // 4, width=W // 4)
    proj_ms = {}
    for s in range(1, 4):
        p = projs.copy()
        p[:, :, 1, :2, :] *= 2.0 ** (s - 1)
        proj_ms[f"stage{s}"] = jnp.asarray(p)
    imgs = jnp.asarray(rng.random((B, N, H, W, 3)).astype(np.float32))
    dvals = jnp.asarray(np.linspace(4, 8, 16, dtype=np.float32)[None])
    # D must shrink 2x then 4x for the depth-pooling alignment (64->32->8
    # in the shipped config; 16->8->2 here)
    model = CascadeMVSNet(ndepths=(16, 8, 2), reg_mode="georeg",
                          use_geo_fusion=False)
    v = model.init(jax.random.PRNGKey(0), imgs, proj_ms, dvals, None,
                   train=False)
    out = model.apply(v, imgs, proj_ms, dvals, None, train=False)
    assert out["stage3"]["depth"].shape == (B, H, W)
    assert np.isfinite(np.asarray(out["stage3"]["depth"])).all()
    assert "geo_reg_stage2" in v["params"]


@pytest.mark.slow
def test_bf16_compute_path(rng):
    """bf16 compute dtype: runs, stays finite, tracks the fp32 forward."""
    from damvsnet_tpu.model import CascadeMVSNet
    B, N, H, W = 1, 3, 32, 32
    _, projs = make_rig(batch=B, num_views=N, height=H // 4, width=W // 4)
    proj_ms = {}
    for s in range(1, 4):
        p = projs.copy()
        p[:, :, 1, :2, :] *= 2.0 ** (s - 1)
        proj_ms[f"stage{s}"] = jnp.asarray(p)
    imgs = jnp.asarray(rng.random((B, N, H, W, 3)).astype(np.float32))
    dvals = jnp.asarray(np.linspace(4, 8, 16, dtype=np.float32)[None])

    kw = dict(ndepths=(8, 8, 8), use_geo_fusion=False)
    m32 = CascadeMVSNet(**kw)
    v = m32.init(jax.random.PRNGKey(0), imgs, proj_ms, dvals, None, train=False)
    out32 = m32.apply(v, imgs, proj_ms, dvals, None, train=False)
    m16 = CascadeMVSNet(**kw, compute_dtype=jnp.bfloat16)
    out16 = m16.apply(v, imgs, proj_ms, dvals, None, train=False)
    d32 = np.asarray(out32["stage3"]["depth"])
    d16 = np.asarray(out16["stage3"]["depth"])
    assert d16.dtype == np.float32  # stats tail stays fp32
    assert np.isfinite(d16).all()
    # depth range is ~[4, 8]; bf16 cascade should stay within a few percent
    assert np.abs(d16 - d32).mean() < 0.15, np.abs(d16 - d32).mean()


def test_superglue_position_encoding(rng):
    from damvsnet_tpu.nn.posenc import PositionEncodingSuperGlue
    x = jnp.asarray(rng.standard_normal((1, 8, 10, 32)).astype(np.float32))
    m = PositionEncodingSuperGlue(d_model=32)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == x.shape
    assert not np.allclose(np.asarray(y), np.asarray(x))


def test_unsup_loss(rng):
    from damvsnet_tpu.losses import unsup_loss
    from damvsnet_tpu.data.synthetic import make_synthetic_sample
    s = make_synthetic_sample(height=32, width=40, nviews=3, ndepths=8)
    imgs = jnp.asarray(s["imgs"][None])
    cams = {k: jnp.asarray(v[None]) for k, v in s["proj_matrices"].items()}
    outputs = {f"stage{i}": {"depth": jnp.asarray(
        s["depth"][f"stage{i}"][None])} for i in (1, 2, 3)}
    total, last = unsup_loss(outputs, imgs, cams)
    assert np.isfinite(float(total))
    # GT depth must score better than a corrupted depth
    bad_outputs = {k: {"depth": v["depth"] * 1.3} for k, v in outputs.items()}
    total_bad, _ = unsup_loss(bad_outputs, imgs, cams)
    assert float(total) < float(total_bad)


def test_ssim_identity(rng):
    from damvsnet_tpu.losses import ssim
    x = jnp.asarray(rng.random((1, 12, 12, 3)).astype(np.float32))
    d = ssim(x, x)
    assert float(jnp.max(jnp.abs(d))) < 1e-4


def test_sobel_edges(rng):
    from damvsnet_tpu.data.edges import sobel_edges
    img = np.zeros((16, 16, 3), np.float32)
    img[:, 8:] = 1.0
    e = sobel_edges(img)
    assert e.shape == (16, 16)
    assert e[:, 7:9].max() > 0.5  # strong response at the step edge
    assert e[:, :5].max() < 1e-6


def test_summary_writer(tmp_path):
    from damvsnet_tpu.train.logging import SummaryWriter
    w = SummaryWriter(str(tmp_path))
    w.add_scalars("train", {"loss": 1.5, "abs_err": 0.25}, step=10)
    w.add_scalars("train", {"loss": 1.2}, step=20)
    w.close()
    events = [f for f in os.listdir(tmp_path) if f.startswith("events.out")]
    assert events
    assert os.path.getsize(tmp_path / events[0]) > 0
    import json
    lines = [json.loads(x) for x in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["loss"] == 1.5 and lines[0]["step"] == 10


def test_checkpoint_max_keep(tmp_path):
    import optax
    from damvsnet_tpu.train.state import TrainState, save_checkpoint
    tx = optax.sgd(0.1)
    params = {"w": jnp.zeros(3)}
    for epoch in range(5):
        st = TrainState(step=epoch, epoch=epoch, params=params,
                        batch_stats={}, opt_state=tx.init(params), tx=tx)
        save_checkpoint(str(tmp_path), st, max_keep=2)
    kept = sorted(d for d in os.listdir(tmp_path) if d.startswith("ckpt_"))
    assert kept == ["ckpt_000003", "ckpt_000004"]


def test_summary_writer_images(tmp_path):
    """Image summaries land in the event file as framed records whose CRCs
    verify and whose payload embeds a PNG (utils.py:83-101 save_images
    parity at the wire level)."""
    from damvsnet_tpu.train.logging import (SummaryWriter, _masked_crc32c)
    w = SummaryWriter(str(tmp_path))
    depth = np.linspace(0, 1, 24 * 32, dtype=np.float32).reshape(24, 32)
    rgb = np.zeros((24, 32, 3), np.uint8)
    rgb[:, 16:] = 255
    w.add_images("train", {"depth_est": depth[None],  # batched [B,H,W]
                           "ref_img": rgb}, step=5)
    w.close()
    events = [f for f in os.listdir(tmp_path) if f.startswith("events.out")]
    data = open(tmp_path / events[0], "rb").read()
    # walk the TFRecord framing: len(8) lencrc(4) payload lencrc(4)
    import struct
    off, n_img = 0, 0
    while off < len(data):
        (ln,) = struct.unpack("<Q", data[off:off + 8])
        (hcrc,) = struct.unpack("<I", data[off + 8:off + 12])
        assert hcrc == _masked_crc32c(data[off:off + 8])
        payload = data[off + 12:off + 12 + ln]
        (pcrc,) = struct.unpack("<I",
                                data[off + 12 + ln:off + 16 + ln])
        assert pcrc == _masked_crc32c(payload)
        if b"\x89PNG" in payload:
            n_img += 1
        off += 16 + ln
    assert n_img == 2


def test_visualize_maps(tmp_path):
    from damvsnet_tpu.utils.visualize import (
        confidence_to_color, depth_to_color, error_to_color,
        visualize_results_dir)
    depth = np.linspace(4, 8, 20 * 24).reshape(20, 24).astype(np.float32)
    rgb = depth_to_color(depth)
    assert rgb.shape == (20, 24, 3) and rgb.dtype == np.uint8
    assert not np.array_equal(rgb[0, 0], rgb[-1, -1])  # spans the ramp
    conf = np.clip(depth / 8.0, 0, 1)
    cc = confidence_to_color(conf, threshold=0.9)
    assert cc.shape == (20, 24, 3)
    err = error_to_color(depth, depth + 1.0, mask=np.ones_like(depth))
    assert err.shape == (20, 24, 3)
    # invalid pixels are black
    d2 = depth.copy()
    d2[0, 0] = np.nan
    assert (depth_to_color(d2)[0, 0] == 0).all()

    # results-directory walker over a runner-layout tree
    from damvsnet_tpu.core.pfm import write_pfm
    scene = tmp_path / "scan1"
    (scene / "depth_est").mkdir(parents=True)
    (scene / "confidence").mkdir()
    write_pfm(str(scene / "depth_est" / "00000000.pfm"), depth)
    write_pfm(str(scene / "confidence" / "00000000.pfm"), conf)
    n = visualize_results_dir(str(tmp_path), log_fn=lambda *_: None)
    assert n == 2
    viz = scene / "viz"
    names = sorted(os.listdir(viz))
    assert "depth_00000000.png" in names and "conf_00000000.png" in names
    assert "masked_00000000.png" in names
