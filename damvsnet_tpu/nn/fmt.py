"""FMT: the feature-matching transformer (TransMVSNet lineage).

Parity with /root/reference/models/FMT.py:

  * LinearAttention (:16-37): elu(x)+1 kernelized attention, O(N d^2) —
    KV = sum_s K_s V_s^T is a per-head d x d summary, so attention is two
    small matmuls + a normalizer. This maps beautifully onto the MXU and,
    under sequence sharding, "ring attention" degenerates to a single psum
    of (KV, K_sum) — see parallel/ for the sharded variant.
  * AttentionLayer / EncoderLayer (:40-111): post-norm residual blocks with
    a 2x FFN, dropout 0.
  * FMT (:114-174): layer_names = ['self','cross'] x 4. The reference view
    passes through the 4 self layers (intermediate results collected); each
    source view alternates self and cross-to-ref(i//2).
  * FMTWithPathway (:178-225): applies FMT at stage 1 and propagates the
    transformed features down the FPN with 1x1 dim reductions, bilinear
    upsample-add, and 3x3 smoothing.

Layout: features NHWC; token axis is the flattened (H*W).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from .precision import get_compute_dtype
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from .posenc import sine_position_encoding


def linear_attention(q, k, v, eps: float = 1e-6):
    """q, k, v: [B, L, H, D] -> [B, L, H, D] (kernelized, elu+1 feature map)."""
    q = nn.elu(q) + 1.0
    k = nn.elu(k) + 1.0
    kv = jnp.einsum("nshd,nshm->nhmd", k, v)
    z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", q, k.sum(axis=1)) + eps)
    return jnp.einsum("nlhd,nhmd,nlh->nlhm", q, kv, z)


def _sp_mesh_for(axis: str | None, seq_len: int):
    """The active mesh if sequence-parallel attention applies: the axis
    exists on the context mesh with size > 1 dividing the token count."""
    if axis is None:
        return None
    from ..parallel.mesh import active_mesh, mesh_axis_size
    size = mesh_axis_size(axis, warn_context="FMT sp_axis")
    if size > 1 and seq_len % size == 0:
        return active_mesh()
    return None


class AttentionLayer(nn.Module):
    d_model: int
    n_heads: int
    sp_axis: str | None = None

    @nn.compact
    def __call__(self, queries, keys, values):
        n, l, _ = queries.shape
        h = self.n_heads
        dk = self.d_model // h
        q = nn.Dense(dk * h, dtype=get_compute_dtype(), name="query_projection")(queries).reshape(n, l, h, dk)
        k = nn.Dense(dk * h, dtype=get_compute_dtype(), name="key_projection")(keys).reshape(n, keys.shape[1], h, dk)
        v = nn.Dense(dk * h, dtype=get_compute_dtype(), name="value_projection")(values).reshape(n, values.shape[1], h, dk)
        mesh = _sp_mesh_for(self.sp_axis, l) if l == keys.shape[1] else None
        if mesh is not None:
            from ..parallel.fmt_sp import sequence_parallel_linear_attention
            out = sequence_parallel_linear_attention(
                q, k, v, mesh, axis=self.sp_axis).reshape(n, l, -1)
        else:
            out = linear_attention(q, k, v).reshape(n, l, -1)
        return nn.Dense(self.d_model, dtype=get_compute_dtype(), name="out_projection")(out)


class EncoderLayer(nn.Module):
    d_model: int
    n_heads: int
    sp_axis: str | None = None

    @nn.compact
    def __call__(self, x, source):
        x = x + AttentionLayer(self.d_model, self.n_heads,
                               sp_axis=self.sp_axis)(x, source, source)
        x = nn.LayerNorm(name="norm1")(x)
        y = nn.Dense(2 * self.d_model, dtype=get_compute_dtype(), name="linear1")(x)
        y = nn.relu(y)
        y = nn.Dense(self.d_model, dtype=get_compute_dtype(), name="linear2")(y)
        return nn.LayerNorm(name="norm2")(x + y)


class FMT(nn.Module):
    d_model: int = 32
    n_heads: int = 8
    layer_names: Sequence[str] = ("self", "cross") * 4
    sp_axis: str | None = None

    def setup(self):
        self.layers = [
            EncoderLayer(self.d_model, self.n_heads, sp_axis=self.sp_axis,
                         name=f"layer{i}")
            for i in range(len(self.layer_names))
        ]

    def ref_forward(self, ref_feature):
        """ref_feature [B, H, W, C] -> list of per-self-layer [B, H, W, C]."""
        b, h, w, c = ref_feature.shape
        assert c == self.d_model
        x = sine_position_encoding(ref_feature).reshape(b, h * w, c)
        outs = []
        for layer, name in zip(self.layers, self.layer_names):
            if name == "self":
                x = layer(x, x)
                outs.append(x.reshape(b, h, w, c))
        return outs

    def src_forward(self, ref_feature_list, src_feature):
        """Alternating self / cross-to-ref(i//2) for one source view."""
        b, h, w, c = src_feature.shape
        refs = [r.reshape(b, h * w, c) for r in ref_feature_list]
        x = sine_position_encoding(src_feature).reshape(b, h * w, c)
        for i, (layer, name) in enumerate(zip(self.layers, self.layer_names)):
            if name == "self":
                x = layer(x, x)
            elif name == "cross":
                x = layer(x, refs[i // 2])
            else:
                raise KeyError(name)
        return x.reshape(b, h, w, c)

    def __call__(self, ref_feature, src_feature=None, feat: str = "ref"):
        if feat == "ref":
            return self.ref_forward(ref_feature)
        return self.src_forward(ref_feature, src_feature)


class FMTWithPathway(nn.Module):
    base_channels: int = 8
    sp_axis: str | None = None  # mesh axis for sequence-parallel attention

    def setup(self):
        b = self.base_channels
        self.fmt = FMT(d_model=4 * b, sp_axis=self.sp_axis)
        self.dim_reduction_1 = nn.Conv(2 * b, (1, 1), use_bias=False)
        self.dim_reduction_2 = nn.Conv(b, (1, 1), use_bias=False)
        self.smooth_1 = nn.Conv(2 * b, (3, 3), padding=1, use_bias=False)
        self.smooth_2 = nn.Conv(b, (3, 3), padding=1, use_bias=False)

    def _upsample_add(self, x, y):
        return resize_bilinear(x, y.shape[1:3], align_corners=False) + y

    def __call__(self, features):
        """features: list over views of {"stage1","stage2","stage3"} NHWC."""
        out = []
        ref_fea_t_list = None
        for nview_idx, fms in enumerate(features):
            fms = dict(fms)
            if nview_idx == 0:
                ref_fea_t_list = self.fmt(fms["stage1"], feat="ref")
                fms["stage1"] = ref_fea_t_list[-1]
            else:
                fms["stage1"] = self.fmt(ref_fea_t_list, fms["stage1"], feat="src")
            fms["stage2"] = self.smooth_1(
                self._upsample_add(self.dim_reduction_1(fms["stage1"]), fms["stage2"]))
            fms["stage3"] = self.smooth_2(
                self._upsample_add(self.dim_reduction_2(fms["stage2"]), fms["stage3"]))
            out.append(fms)
        return out
