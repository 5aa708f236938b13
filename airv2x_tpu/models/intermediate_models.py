"""Intermediate-fusion models sharing the encode->backbone->fuse->head spine.

The reference repeats this spine in every ``airv2x_*`` / ``point_pillar_*``
model file (hetero encode -> BaseBEVBackbone -> shrink -> fuse on the 2d
feature map -> 1x1 heads); here it lives once in ``PostBackboneFusionModel``
and each collaboration method supplies only its fusion module:

  * airv2x_attfusion / airv2x_maxfusion — single-shot attention / max
    (fusion_in_one.py AttFusion :130 / MaxFusion :90 baselines)
  * airv2x_cobevt — fused-axial swap attention (airv2x_cobevt.py)
  * airv2x_v2vnet — iterative ConvGRU message passing (airv2x_v2vnet.py)
  * airv2x_when2com — learned handshake selection (airv2x_when2com.py)
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from airv2x_tpu.models.base import HeteroLidarEncoder, SlotLayout
from airv2x_tpu.models.bev_backbone import BaseBEVBackbone
from airv2x_tpu.models.fusion.cobevt import SwapFusionEncoder
from airv2x_tpu.models.fusion.common import ego_agent_attention, max_fusion
from airv2x_tpu.models.fusion.v2vnet import V2VNetFusion
from airv2x_tpu.models.fusion.when2com import When2comFusion
from airv2x_tpu.models.heads import BevSegHead, DetectionHeads
from airv2x_tpu.models.nn import DownsampleConv, NaiveCompressor
from airv2x_tpu.models.registry import register_model


class PostBackboneFusionModel(nn.Module):
    """Shared spine; subclasses override ``setup_fusion`` and ``fuse``."""

    args: dict
    dtype: Any = jnp.float32

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
            keep_modal=getattr(self, "keep_modal_encoder", False),
            dtype=self.dtype,
        )
        # cobevt/sicp reference configs keep the trunk keys at the
        # model-args top level instead of under modality_fusion
        # (airv2x_cobevt.py:37-48 vs airv2x_v2xvit.py:32-39)
        mod = args.get("modality_fusion") or args
        bb = mod["base_bev_backbone"]
        self.backbone = BaseBEVBackbone(
            layer_nums=bb["layer_nums"],
            layer_strides=bb["layer_strides"],
            num_filters=bb["num_filters"],
            upsample_strides=bb["upsample_strides"],
            num_upsample_filters=bb["num_upsample_filter"],
            remat=bool(args.get("remat")),
            dtype=self.dtype,
        )
        shrink = mod.get("shrink_header", {})
        self.shrink_flag = bool(shrink.get("use"))
        if self.shrink_flag:
            self.shrink_conv = DownsampleConv(
                dims=shrink["dim"],
                kernels=shrink["kernal_size"],
                strides=shrink["stride"],
                paddings=shrink.get("padding"),
                dtype=self.dtype,
            )
        self.compression = int(mod.get("compression", 0)) > 0
        if self.compression:
            self.compressor = NaiveCompressor(
                256, mod["compression"], dtype=self.dtype
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
        self.setup_fusion()

    def setup_fusion(self):
        raise NotImplementedError

    def fuse(self, grouped, batch, train):
        """(B, L, H, W, C) -> ((B, H, W, C), comm_rate)."""
        raise NotImplementedError

    def __call__(self, batch, train: bool = False):
        x = self.encoder(batch, train)  # (B, L, ny, nx, C)
        b, l = x.shape[:2]
        flat = x.reshape((b * l,) + x.shape[2:])

        feats, _ = self.backbone(flat, train)
        if self.shrink_flag:
            feats = self.shrink_conv(feats, train)
        if self.compression:
            feats = self.compressor(feats, train)

        grouped = feats.reshape((b, l) + feats.shape[1:])
        fused, rate = self.fuse(grouped, batch, train)

        if self.task == "det":
            out = dict(self.heads(fused))
        else:
            out = dict(self.seg_head(fused))
        out["comm_rate"] = rate
        return out


@register_model("airv2x_attfusion", "airv2x_intermediate")
class Airv2xAttFusion(PostBackboneFusionModel):
    """Per-pixel ego-query attention fusion (AttFusion twin)."""

    def setup_fusion(self):
        pass

    def fuse(self, grouped, batch, train):
        return ego_agent_attention(grouped, batch["agent_mask"]), jnp.asarray(1.0)


@register_model("airv2x_maxfusion")
class Airv2xMaxFusion(PostBackboneFusionModel):
    """Masked elementwise-max fusion (MaxFusion twin)."""

    def setup_fusion(self):
        pass

    def fuse(self, grouped, batch, train):
        return max_fusion(grouped, batch["agent_mask"]), jnp.asarray(1.0)


@register_model("airv2x_cobevt")
class Airv2xCoBEVT(PostBackboneFusionModel):
    """Fused-axial swap attention (twin of airv2x_cobevt.py; agent_size is
    injected from max_cav_num as in its __init__ :50)."""

    def setup_fusion(self):
        fax = dict(self.args["fax_fusion"])
        fax["agent_size"] = self.layout.total
        self.fusion_net = SwapFusionEncoder(args=fax, dtype=self.dtype)

    def fuse(self, grouped, batch, train):
        return (
            self.fusion_net(grouped, batch["agent_mask"], train),
            jnp.asarray(1.0),
        )


@register_model("airv2x_v2vnet")
class Airv2xV2VNet(PostBackboneFusionModel):
    def setup_fusion(self):
        self.fusion_net = V2VNetFusion(args=self.args["v2vfusion"], dtype=self.dtype)

    def fuse(self, grouped, batch, train):
        return (
            self.fusion_net(
                grouped, batch["agent_mask"], batch["pairwise_t_full"], train
            ),
            jnp.asarray(1.0),
        )


@register_model("airv2x_when2com")
class Airv2xWhen2com(PostBackboneFusionModel):
    def setup_fusion(self):
        self.fusion_net = When2comFusion(
            args=self.args["when2com_fusion"], dtype=self.dtype
        )

    def fuse(self, grouped, batch, train):
        return (
            self.fusion_net(
                grouped, batch["agent_mask"], batch["pairwise_t_full"], train
            ),
            jnp.asarray(1.0),
        )
