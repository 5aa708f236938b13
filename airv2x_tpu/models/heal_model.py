"""Airv2x HEAL model (TPU twin of models/airv2x_heal.py).

Pipeline (reference forward :136-181): hetero encode -> single-stage ResNet
modality backbone -> pyramid fusion (multiscale occupancy-weighted
warp-fuse) -> shrink -> heads. Supports the multi-stage recipe via
``backbone_fix`` param-freezing masks (see parallel.train.freeze_mask).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from airv2x_tpu.models.base import HeteroLidarEncoder, SlotLayout
from airv2x_tpu.models.fusion.pyramid import PyramidFusion
from airv2x_tpu.models.heads import BevSegHead, DetectionHeads
from airv2x_tpu.models.nn import DownsampleConv
from airv2x_tpu.models.registry import register_model
from airv2x_tpu.models.resnet_bev import ResNetBEVBackbone


@register_model("airv2x_heal")
class Airv2xHEAL(nn.Module):
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
            dtype=self.dtype,
        )
        # cobevt/sicp reference configs keep the trunk keys at the
        # model-args top level instead of under modality_fusion
        # (airv2x_cobevt.py:37-48 vs airv2x_v2xvit.py:32-39)
        mod = args.get("modality_fusion") or args
        bb = mod["base_bev_backbone"]
        self.backbone = ResNetBEVBackbone(
            layer_nums=bb["layer_nums"],
            layer_strides=bb["layer_strides"],
            num_filters=bb["num_filters"],
            upsample_strides=bb.get("upsample_strides", ()),
            num_upsample_filters=bb.get("num_upsample_filter", ()),
            inplanes=64,
            dtype=self.dtype,
        )
        self.pyramid = PyramidFusion(
            args=args["fusion_backbone"],
            inplanes=bb["num_filters"][-1],
            dtype=self.dtype,
        )
        # upstream airv2x_heal.py imports AlignNet but never wires it; we
        # expose it config-gated for hetero-feature alignment experiments
        if "alignnet" in args:
            from airv2x_tpu.models.alignnet import AlignNet

            self.alignnet = AlignNet(cfg=dict(args["alignnet"]), dtype=self.dtype)
        else:
            self.alignnet = None
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

        self.task = args["task"]
        head_dim_key = "in_head" if "in_head" in args else "head_dim"
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
        b, l = x.shape[:2]
        flat = x.reshape((b * l,) + x.shape[2:])

        feats, _ = self.backbone(flat, train)  # single-stage 64ch stride 2
        if self.alignnet is not None:
            feats = self.alignnet(feats, train)
        grouped = feats.reshape((b, l) + feats.shape[1:])

        pre = self.args["preprocess"]
        discrete_ratio = pre["args"]["voxel_size"][0]
        h0 = x.shape[2]
        downsample = h0 // feats.shape[1]
        fused, occ_maps = self.pyramid.forward_collab(
            grouped,
            batch["agent_mask"],
            batch["pairwise_t"],
            discrete_ratio,
            downsample,
            train,
            # heterogeneous camera agents only trust the central BEV window
            # (pyramid_fuse.py cam_crop_info) — (B, L, 2) ratios if present
            cam_crop_ratios=batch.get("cam_crop_ratios"),
        )
        if self.shrink_flag:
            fused = self.shrink_conv(fused, train)

        out = {}
        if self.task == "det":
            out.update(self.heads(fused))
        else:
            out.update(self.seg_head(fused))
        out["comm_rate"] = jnp.asarray(1.0)
        return out
