"""CascadeMVSNet: the 3-stage coarse-to-fine MVS depth cascade.

Structural parity with /root/reference/models/cas_mvsnet.py:137-319:

  per view:  FeatureNet (FPN)  [optionally FMT-transformed]
  per stage: [GeoFeatureFusion replaces ref feature at stages 2/3]
             -> uncertainty-aware (ADIA) depth sampling at full resolution
             -> trilinear snap to stage resolution
             -> DepthNet core: fused-proj plane-sweep warp -> adaptive or
                variance cost volume -> CostRegNet 3-D U-Net -> softmax ->
                soft-argmin depth + confidence + 3-sigma band
  stage handoff: depth & sigma detached ("detach" grad method), bilinearly
                 upsampled to input resolution.

Everything is a pure function of (params, batch); the stage loop is a
static Python unroll (3 compiled stages), shapes are static, and all
resampling matches torch conventions (see ops/resize.py).

Layout: images [B, N, H, W, 3]; proj_matrices {stage: [B, N, 2, 4, 4]}
(extrinsics in slot 0, stage-scaled K in slot 1 — the dataset wire format);
depth_values [B, D0].
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.aggweight import AggWeightNetVolume
from ..nn.costreg import CostRegNet
from ..nn.georeg import GeoRegNet2d
from ..nn.feature import FeatureNet
from ..nn.fmt import FMTWithPathway
from ..nn.geofusion import GeoFeatureFusion
from ..nn.precision import compute_dtype as compute_dtype_scope
from ..nn.refine import RefineNet
from ..ops.costvol import build_cost_volume
from ..ops.regression import prob_volume_stats
from ..ops.resize import resize_bilinear, resize_trilinear_depth
from ..ops.sampling import uncertainty_aware_samples


def fuse_projection_matrices(proj: jnp.ndarray) -> jnp.ndarray:
    """[..., 2, 4, 4] (extrinsics, K-padded) -> fused [..., 4, 4] with
    rows 0..2 = K @ E[:3, :4] (parity: models/cas_mvsnet.py:44-47)."""
    ext = proj[..., 0, :, :]
    k = proj[..., 1, :3, :3]
    top = jnp.matmul(k, ext[..., :3, :4], precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([top, ext[..., 3:4, :]], axis=-2)


class CascadeMVSNet(nn.Module):
    ndepths: Sequence[int] = (64, 32, 8)
    depth_intervals_ratio: Sequence[int] = (4, 2, 1)
    cr_base_chs: Sequence[int] = (8, 8, 8)
    share_cr: bool = False
    grad_method: str = "detach"
    arch_mode: str = "fpn"
    agg_mode: str = "adaptive"  # "adaptive" | "variance"
    base_channels: int = 8
    use_fmt: bool = False
    use_geo_fusion: bool = True
    refine: bool = False
    reg_mode: str = "costreg"  # "costreg" (CasMVSNet 3D U-Net) |
    # "georeg" (prob-volume-embedding GeoRegNet2d — the
    # cas_mvsnet_embeddingProbVolme variant, encodings std/z/z)
    compute_dtype: Any = jnp.float32
    sampler: str = "auto"  # plane-sweep sampler: "xla" (gather,
    # differentiable) | "pallas" (banded one-hot-matmul TPU kernel) |
    # "auto" (pallas at inference on TPU, xla otherwise/when training)
    sampler_opts: Any = None  # optional dict forwarded to the pallas
    # sampler (wb, band_rows, depth_group, lookahead, interpret); keys
    # "stage1"/"stage2"/"stage3" may hold per-stage override dicts (the
    # stages' window budgets differ: spans in pixels scale with stage
    # resolution). The per-stage dropped-taps flag is surfaced as
    # outputs["sampler_overflow"] so callers (infer/runner.py) can
    # detect and redo with the XLA path
    stats_kernel: str = "auto"  # prob-volume stats tail: "xla" | "pallas"
    # (fused single-pass Pallas kernel, ops/pallas/probstats.py) | "auto"
    # (pallas at inference on TPU, xla otherwise — stats have no VJP).
    # Even an explicit "pallas" is guarded by the train/is_initializing
    # checks: the kernel has no VJP and flax init must not trace it.
    stats_interpret: bool | None = None  # pallas interpret mode for the
    # stats kernel; None inherits sampler_opts["interpret"]
    fused_train: bool = False  # run the fused Pallas cost volume during
    # TRAINING too, via its custom VJP (ops/pallas/fused_costvol_vjp.py):
    # banded forward + banded-matmul-transpose backward, no per-view
    # volumes in HBM either direction. Gradient semantics match the
    # reference (warp grid under no_grad, module.py:297-300). Deviation:
    # AggWeightNet's two 1-channel BNs use RUNNING statistics while this
    # is enabled (the folded affine form) instead of batch statistics —
    # a frozen-BN change on the tiny weight net only. The per-stage
    # overflow flag is still surfaced; training does not redo on
    # overflow (no data-dependent control flow under jit), so monitor
    # outputs["sampler_overflow"] when enabling on a new geometry.
    fmt_sp_axis: str | None = None  # mesh axis for sequence-parallel FMT
    # attention (parallel/fmt_sp.py): shard the (h*w) token axis; exact —
    # linear attention's KV summary reduces over tokens, so the "ring" is
    # one psum. Requires running under a Mesh carrying the axis.
    costreg_depth_block: Any = "auto"  # depth-block repacking of the 3-D
    # U-Nets (ops/depthblock.py): int block size, 0 = off, "auto" = 16 on
    # TPU / off elsewhere. Exact — same params and math — so it applies
    # to training and inference alike.
    feature_height_block: Any = "auto"  # height-block repacking of the
    # FeatureNet trunk/head convs (same machinery along H): int cap,
    # 0 = off, "auto" = 16 on TPU / off elsewhere.
    clamp_samples: bool = False  # clip ADIA stage-2/3 hypotheses into the
    # input sweep range [min(depth_values), max(depth_values)]. The
    # reference leaves d + 3*sigma unbounded (module.py:999-1038), so a
    # flat-probability pixel can request hypotheses far outside the swept
    # range — harmless for the XLA gather sampler but unbounded for the
    # banded kernel's window budget (one bad pixel flips the overflow
    # flag and forces the whole-batch XLA redo). With the clamp, spans
    # are bounded by the rig's full-sweep spans and window sizes can be
    # chosen to never overflow. Default OFF for reference parity; binds
    # only in the blown-sigma regime where depth is garbage anyway.
    slab_axis: str | None = None  # mesh axis name for depth-slab sharding
    # of the cost volume (SURVEY §5): the [B, D, H, W(, C)] volumes are
    # constrained to shard D over this axis; GSPMD inserts the halo
    # exchanges for the regularizer's D-axis convs. Requires running
    # under a Mesh that has the axis.

    @property
    def num_stage(self) -> int:
        return len(self.ndepths)

    @staticmethod
    def _auto_block(setting) -> int:
        if setting == "auto":
            return 16 if jax.default_backend() == "tpu" else 0
        return int(setting)

    def _resolved_depth_block(self) -> int:
        return self._auto_block(self.costreg_depth_block)

    def setup(self):
        assert self.agg_mode in ("adaptive", "variance")
        assert self.grad_method in ("detach", "undetach")
        self.feature = FeatureNet(
            base_channels=self.base_channels,
            num_stage=self.num_stage,
            arch_mode=self.arch_mode,
            height_block=self._auto_block(self.feature_height_block),
        )
        if self.use_geo_fusion:
            self.geo_fusion = GeoFeatureFusion(
                convolutional_layer_encoding="z", mask_type="basic",
                add_origin_feat_flag=True)
        if self.use_fmt:
            self.fmt_pathway = FMTWithPathway(base_channels=self.base_channels,
                                              sp_axis=self.fmt_sp_axis)
        assert self.reg_mode in ("costreg", "georeg")
        if self.reg_mode == "georeg":
            encodings = (["std"] + ["z"] * (self.num_stage - 1))
            self.cost_regularization = [
                GeoRegNet2d(convolutional_layer_encoding=encodings[i],
                            name=f"geo_reg_stage{i + 1}")
                for i in range(self.num_stage)
            ]
        elif self.share_cr:
            self.cost_regularization = CostRegNet(
                base_channels=8, slab_axis=self.slab_axis,
                depth_block=self._resolved_depth_block())
        else:
            self.cost_regularization = [
                CostRegNet(base_channels=self.cr_base_chs[i],
                           slab_axis=self.slab_axis,
                           depth_block=self._resolved_depth_block(),
                           name=f"cost_reg_stage{i + 1}")
                for i in range(self.num_stage)
            ]
        if self.agg_mode == "adaptive":
            self.weight_nets = [
                AggWeightNetVolume(name=f"agg_weight_stage{i + 1}")
                for i in range(self.num_stage)
            ]
        if self.refine:
            self.refine_network = RefineNet()

    def _depth_net(self, stage_idx, features_stage, proj_stage, depth_samples,
                   train, prob_volume_last=None):
        """The per-stage DepthNet core (parity: cas_mvsnet.py:18-134)."""
        fused = fuse_projection_matrices(proj_stage)  # [B, N, 4, 4]
        ref_fea = features_stage[0]
        src_feas = features_stage[1:]
        ref_proj = fused[:, 0]
        src_projs = [fused[:, i] for i in range(1, fused.shape[1])]

        weight_fn = None
        if self.agg_mode == "adaptive":
            wnet = self.weight_nets[stage_idx]
            weight_fn = lambda vol: wnet(vol, train)

        # resolve per-stage sampler_opts overrides
        stage_opts = dict(self.sampler_opts or {})
        override = None
        for k in ("stage1", "stage2", "stage3"):
            o = stage_opts.pop(k, None)
            if k == f"stage{stage_idx + 1}":
                override = o
        if override:
            stage_opts.update(override)

        # training: the fused kernel is used only with its custom VJP
        # (fused_train); otherwise fall back to the XLA gather path
        use_fused_train = (train and self.fused_train
                           and self.agg_mode == "adaptive"
                           and not self.is_initializing())
        sampler = "xla" if (train and self.sampler != "xla") else self.sampler
        if sampler == "auto":
            from ..ops.warp import pallas_sampler_supported
            sampler = "pallas" if pallas_sampler_supported(ref_fea) else "xla"
        if use_fused_train:
            from ..nn.aggweight import fold_aggweight
            from ..ops.pallas.fused_costvol_vjp import (
                fused_adaptive_cost_volume_vjp)
            w1, b1, w2, b2 = fold_aggweight(
                self.weight_nets[stage_idx].variables)
            # the trainable kernel has no two-tier/subtile modes
            # (single-window VJP)
            train_opts = {k: v for k, v in stage_opts.items()
                          if k not in ("two_tier", "narrow_wb",
                                       "narrow_band_rows", "x_subtiles",
                                       "sub_wb")}
            volume, overflow = fused_adaptive_cost_volume_vjp(
                ref_fea, src_feas, ref_proj, src_projs, depth_samples,
                w1, b1, w2, b2, **train_opts)
        elif (sampler == "pallas" and self.agg_mode == "adaptive"
                and not train and not self.is_initializing()):
            # fully fused TPU path: warp + diff^2 + folded AggWeightNet +
            # view accumulation in one kernel — per-view volumes never
            # reach HBM (ops/pallas/fused_costvol.py)
            from ..nn.aggweight import fold_aggweight
            from ..ops.pallas.fused_costvol import fused_adaptive_cost_volume
            w1, b1, w2, b2 = fold_aggweight(
                self.weight_nets[stage_idx].variables)
            volume, overflow = fused_adaptive_cost_volume(
                ref_fea, src_feas, ref_proj, src_projs, depth_samples,
                w1, b1, w2, b2, **stage_opts)
        else:
            ac = stage_opts.pop("align_corners", False)
            volume, overflow = build_cost_volume(
                ref_fea, src_feas, ref_proj, src_projs, depth_samples,
                mode=self.agg_mode, weight_fn=weight_fn,
                align_corners=ac, sampler=sampler,
                sampler_opts=stage_opts or None, return_overflow=True)
        # no constraint during flax init: init traces the forward outside
        # any mesh context, and the "no active mesh" warning there is
        # noise (the real apply runs under `with mesh:`)
        if self.slab_axis is not None and not self.is_initializing():
            from ..parallel.mesh import slab_constraint
            volume = slab_constraint(volume, self.slab_axis)

        if self.reg_mode == "georeg":
            cost_reg = self.cost_regularization[stage_idx](
                volume, stage_idx, prob_volume_last, train)  # [B, D, H, W]
        else:
            reg = (self.cost_regularization if self.share_cr
                   else self.cost_regularization[stage_idx])
            cost_reg = reg(volume, train)[..., 0]  # [B, D, H, W]
        # softmax / soft-argmin always in fp32 (mixed-precision boundary);
        # at inference on TPU the four reductions run as one fused VMEM
        # pass (ops/pallas/probstats.py — no VJP, so training keeps XLA)
        want_pallas_stats = self.stats_kernel == "pallas" or (
            self.stats_kernel == "auto" and jax.default_backend() == "tpu")
        use_pallas_stats = (want_pallas_stats and not train
                            and not self.is_initializing())
        if use_pallas_stats:
            from ..ops.pallas.probstats import prob_volume_stats_pallas
            interp = (bool(self.sampler_opts
                           and self.sampler_opts.get("interpret"))
                      if self.stats_interpret is None
                      else self.stats_interpret)
            out = prob_volume_stats_pallas(cost_reg.astype(jnp.float32),
                                           depth_samples, interpret=interp)
        else:
            out = prob_volume_stats(cost_reg.astype(jnp.float32),
                                    depth_samples)
        out["depth_values"] = depth_samples
        out["sampler_overflow"] = overflow[0, 0]
        return out

    def __call__(self, imgs, proj_matrices, depth_values,
                 intrinsics_matrices=None, train: bool = False,
                 edge_imgs=None):
        # edge_imgs: accepted for interface parity with the addEdge variant
        # (models/cas_mvsnet_addEdge.py:185-198) whose edge branch is fully
        # commented out in the reference — it is likewise inert here.
        dt = self.compute_dtype
        if dt is None or dt == jnp.float32:
            return self._forward(imgs, proj_matrices, depth_values,
                                 intrinsics_matrices, train)
        with compute_dtype_scope(dt):
            return self._forward(imgs, proj_matrices, depth_values,
                                 intrinsics_matrices, train)

    def _forward(self, imgs, proj_matrices, depth_values,
                 intrinsics_matrices=None, train: bool = False):
        b, num_views, height, width, _ = imgs.shape

        # step 1: per-view multi-stage features. At inference the N views
        # run as ONE batched FeatureNet call (5x fewer kernel launches,
        # same math — eval BN is running-stat affine, so folding views
        # into the batch axis is exact). Training keeps the reference's
        # per-view loop (cas_mvsnet.py:197-200): batch-stat BN would see
        # a different batch composition if views were folded in.
        if train or self.is_initializing():
            features = [self.feature(imgs[:, v], train)
                        for v in range(num_views)]
        else:
            folded = self.feature(
                imgs.reshape(b * num_views, height, width, imgs.shape[-1]),
                train)
            features = [
                {k: v.reshape((b, num_views) + v.shape[1:])[:, n]
                 for k, v in folded.items()}
                for n in range(num_views)
            ]
        if self.use_fmt:
            features = self.fmt_pathway(features)

        outputs = {}
        depth = None
        exp_var = None
        depth_last = None
        confidence_last = None
        prob_volume_last = None
        for stage_idx in range(self.num_stage):
            stage_name = f"stage{stage_idx + 1}"
            features_stage = [f[stage_name] for f in features]
            proj_stage = proj_matrices[stage_name]
            stage_scale = 2 ** (self.num_stage - 1 - stage_idx)
            stage_h, stage_w = height // stage_scale, width // stage_scale

            # geometry-aware reference-feature fusion (stages >= 2)
            if stage_idx >= 1 and self.use_geo_fusion:
                ref_img_stage = resize_bilinear(imgs[:, 0], (stage_h, stage_w))
                depth_in = resize_bilinear(
                    depth_last[..., None],
                    (depth_last.shape[1] * 2, depth_last.shape[2] * 2))
                conf_in = resize_bilinear(
                    confidence_last[..., None],
                    (confidence_last.shape[1] * 2, confidence_last.shape[2] * 2))
                k_stage = (None if intrinsics_matrices is None
                           else intrinsics_matrices[stage_name])
                features_stage[0] = self.geo_fusion(
                    ref_img_stage, depth_in, conf_in, depth_values,
                    stage_idx, features_stage[0], k_stage, train)

            # stage handoff: previous depth & sigma, upsampled to full res
            if depth is not None:
                if self.grad_method == "detach":
                    cur_depth = jax.lax.stop_gradient(depth)
                    cur_var = jax.lax.stop_gradient(exp_var)
                else:
                    cur_depth = depth
                    cur_var = exp_var
                cur_depth = resize_bilinear(cur_depth[..., None],
                                            (height, width))[..., 0][:, None]
                cur_var = resize_bilinear(cur_var[..., None],
                                          (height, width))[..., 0][:, None]
            else:
                cur_depth = depth_values
                cur_var = None

            if cur_depth.ndim == 2:
                # stage 1: uniform samples are spatially constant, so the
                # full-res build + trilinear snap (cas_mvsnet.py:292-296)
                # is exactly the direct stage-res build — skip the
                # [B, D, H, W] full-res materialization (255 MB at eval)
                samples = uncertainty_aware_samples(
                    cur_depth, cur_var, self.ndepths[stage_idx],
                    stage_h, stage_w)
            else:
                samples = uncertainty_aware_samples(
                    cur_depth, cur_var, self.ndepths[stage_idx], height, width)
                if self.clamp_samples:
                    dmin = jnp.min(depth_values, axis=1)[:, None, None, None]
                    dmax = jnp.max(depth_values, axis=1)[:, None, None, None]
                    samples = jnp.clip(samples, dmin, dmax)
                samples = resize_trilinear_depth(
                    samples, (self.ndepths[stage_idx], stage_h, stage_w))

            pv_last_in = None
            if self.reg_mode == "georeg" and stage_idx >= 1:
                # previous-stage prob volume, spatially upsampled x2
                # (parity: cas_mvsnet_embeddingProbVolme.py:314-318)
                pv = jnp.moveaxis(prob_volume_last, 1, -1)  # [B,h,w,D]
                pv = resize_bilinear(pv, (pv.shape[1] * 2, pv.shape[2] * 2))
                pv_last_in = jnp.moveaxis(pv, -1, 1)

            outputs_stage = self._depth_net(
                stage_idx, features_stage, proj_stage, samples, train,
                prob_volume_last=pv_last_in)

            depth = outputs_stage["depth"]
            prob_volume_last = outputs_stage["prob_volume"]
            depth_last = outputs_stage["depth"]
            confidence_last = outputs_stage["photometric_confidence"]
            exp_var = outputs_stage["variance"]

            outputs[stage_name] = outputs_stage
            outputs.update(outputs_stage)

        # count of stages whose banded sampler dropped taps (0 on XLA path)
        outputs["sampler_overflow"] = sum(
            outputs[f"stage{i + 1}"]["sampler_overflow"]
            for i in range(self.num_stage))

        if self.refine:
            outputs["refined_depth"] = self.refine_network(imgs[:, 0], depth, train)

        return outputs
