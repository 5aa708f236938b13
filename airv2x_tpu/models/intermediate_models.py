"""Baseline intermediate-fusion models (single-shot fusion of BEV features).

TPU twins of the reference's fusion_in_one family
(models/fuse_modules/fusion_in_one.py: MaxFusion :90, AttFusion :130) applied
on the AirV2X heterogeneous encoder — the simplest end-to-end collaborative
detectors, used as the minimum slice and as ablation baselines.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from airv2x_tpu.models.base import HeteroLidarEncoder, SlotLayout
from airv2x_tpu.models.bev_backbone import BaseBEVBackbone
from airv2x_tpu.models.fusion.common import ego_agent_attention, max_fusion
from airv2x_tpu.models.heads import BevSegHead, DetectionHeads
from airv2x_tpu.models.nn import DownsampleConv
from airv2x_tpu.models.registry import register_model


class _IntermediateBase(nn.Module):
    """Encode -> fuse (B, L, ...) -> backbone -> heads."""

    args: dict
    dtype: Any = jnp.float32

    def _fuse(self, x, agent_mask):
        raise NotImplementedError

    def setup(self):
        args = self.args
        self.layout = SlotLayout.from_args(args)
        pre = args["preprocess"]
        self.encoder = HeteroLidarEncoder(
            args=args,
            preprocess=pre,
            layout=self.layout,
            max_pillars=int(pre["args"].get("max_voxel_train", 16000)),
            max_points_per_pillar=int(pre["args"].get("max_points_per_voxel", 32)),
            dtype=self.dtype,
        )
        mod = args["modality_fusion"]
        bb = mod["base_bev_backbone"]
        self.backbone = BaseBEVBackbone(
            layer_nums=bb["layer_nums"],
            layer_strides=bb["layer_strides"],
            num_filters=bb["num_filters"],
            upsample_strides=bb["upsample_strides"],
            num_upsample_filters=bb["num_upsample_filter"],
            dtype=self.dtype,
        )
        shrink = mod.get("shrink_header", {})
        self.shrink_flag = bool(shrink.get("use"))
        if self.shrink_flag:
            self.shrink_conv = DownsampleConv(
                dims=shrink["dim"],
                kernels=shrink["kernal_size"],
                strides=shrink["stride"],
                dtype=self.dtype,
            )
        self.task = args["task"]
        if self.task == "det":
            self.heads = DetectionHeads(
                anchor_number=args["anchor_number"],
                num_class=args["num_class"],
                obj_head=bool(args.get("obj_head", True)),
                dtype=self.dtype,
            )
        else:
            self.seg_head = BevSegHead(
                seg_branch=args["seg_branch"],
                seg_hw=args["seg_hw"],
                dynamic_class=args["dynamic_class"],
                static_class=args["static_class"],
                seg_res=args["seg_res"],
                cav_range=args["cav_range"],
                dtype=self.dtype,
            )

    def __call__(self, batch, train: bool = False):
        x = self.encoder(batch, train)  # (B, L, ny, nx, C)
        fused = self._fuse(x, batch["agent_mask"])  # (B, ny, nx, C)
        feats, _ = self.backbone(fused, train)
        if self.shrink_flag:
            feats = self.shrink_conv(feats, train)
        if self.task == "det":
            out = dict(self.heads(feats))
        else:
            out = dict(self.seg_head(feats))
        out["comm_rate"] = jnp.asarray(1.0)
        return out


@register_model("airv2x_attfusion", "airv2x_intermediate")
class Airv2xAttFusion(_IntermediateBase):
    """Per-pixel ego-query attention fusion (AttFusion twin)."""

    def _fuse(self, x, agent_mask):
        return ego_agent_attention(x, agent_mask)


@register_model("airv2x_maxfusion")
class Airv2xMaxFusion(_IntermediateBase):
    """Masked elementwise-max fusion (MaxFusion twin)."""

    def _fuse(self, x, agent_mask):
        return max_fusion(x, agent_mask)
