"""Airv2x STAMP and SiCP models.

STAMP (twin of models/airv2x_stamp.py): the HEAL pipeline with per-agent-type
Adapters translating each type's backbone features into the shared protocol
space before pyramid fusion (:120-211). Multi-stage training reuses the
freeze machinery (parallel.train.freeze_by_path).

SiCP (twin of models/airv2x_sicp.py:125-215): gated pairwise fusion; during
training both single-agent (ego) and fused heads are supervised
(psm1/rm1/obj1 + psm2/rm2/obj2).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from airv2x_tpu.models.base import AGENT_TYPES, HeteroLidarEncoder, SlotLayout
from airv2x_tpu.models.fusion.adapter import Adapter
from airv2x_tpu.models.fusion.pyramid import PyramidFusion
from airv2x_tpu.models.fusion.sicp import SpatialFusion
from airv2x_tpu.models.heads import BevSegHead, DetectionHeads
from airv2x_tpu.models.intermediate_models import PostBackboneFusionModel
from airv2x_tpu.models.nn import DownsampleConv
from airv2x_tpu.models.registry import register_model
from airv2x_tpu.models.resnet_bev import ResNetBEVBackbone


@register_model("airv2x_stamp")
class Airv2xSTAMP(nn.Module):
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
        self.adapters = {
            t: Adapter(cfg=args[t]["adapter"], dtype=self.dtype, name=f"adapter_{t}")
            for t in AGENT_TYPES
            if self.layout.counts[AGENT_TYPES.index(t)] and "adapter" in args[t]
        }
        self.pyramid = PyramidFusion(
            args=args["fusion_backbone"],
            inplanes=bb["num_filters"][-1],
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
        b, l = x.shape[:2]
        flat = x.reshape((b * l,) + x.shape[2:])
        feats, _ = self.backbone(flat, train)
        grouped = feats.reshape((b, l) + feats.shape[1:])

        # per-type adapters into the protocol feature space
        adapted = []
        for t in AGENT_TYPES:
            sl = self.layout.slots(t)
            if sl.stop == sl.start:
                continue
            ft = grouped[:, sl]
            if t in self.adapters:
                flat_t = ft.reshape((-1,) + ft.shape[2:])
                flat_t = self.adapters[t](flat_t, train)
                ft = flat_t.reshape(ft.shape[:2] + flat_t.shape[1:])
            adapted.append(ft)
        grouped = jnp.concatenate(adapted, axis=1)

        pre = self.args["preprocess"]
        discrete_ratio = pre["args"]["voxel_size"][0]
        downsample = x.shape[2] // grouped.shape[2]
        fused, _ = self.pyramid.forward_collab(
            grouped,
            batch["agent_mask"],
            batch["pairwise_t"],
            discrete_ratio,
            downsample,
            train,
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


@register_model("airv2x_sicp")
class Airv2xSiCP(PostBackboneFusionModel):
    """Gated pairwise fusion with dual (single + coop) supervision."""

    def setup_fusion(self):
        # reference airv2x_sicp.py:61 reads args["fusion"] whose
        # in_channels is already the DOUBLED concat width (512 = 2*256 in
        # airv2x_intermediate_sicp.yaml:253-255); our sicp_fusion key keeps
        # the per-branch width. Accept both conventions.
        fcfg = self.args.get("sicp_fusion")
        if fcfg is not None:
            in_ch = int(fcfg["in_channels"]) * 2
        else:
            fcfg = self.args["fusion"]
            in_ch = int(fcfg["in_channels"])
        self.fusion_net = SpatialFusion(
            in_channels=in_ch,
            out_channels=int(fcfg["out_channels"]),
            dtype=self.dtype,
        )
        self._sicp_cfg = fcfg

    def fuse(self, grouped, batch, train):
        fused = self.fusion_net(
            grouped,
            batch["agent_mask"],
            batch["pairwise_t_full"],
            discrete_ratio=self._sicp_cfg.get("voxel_size", [0.4])[0],
            downsample_rate=self._sicp_cfg.get("downsample_rate", 2),
            train=train,
        )
        return fused, jnp.asarray(1.0)

    def __call__(self, batch, train: bool = False):
        x = self.encoder(batch, train)
        b, l = x.shape[:2]
        flat = x.reshape((b * l,) + x.shape[2:])
        feats, _ = self.backbone(flat, train)
        if self.shrink_flag:
            feats = self.shrink_conv(feats, train)
        grouped = feats.reshape((b, l) + feats.shape[1:])

        fused, rate = self.fuse(grouped, batch, train)
        ego = grouped[:, 0]

        out = {}
        if self.task == "det":
            if train:
                single = self.heads(ego)
                coop = self.heads(fused)
                out.update({f"{k}1": v for k, v in single.items()})
                out.update({f"{k}2": v for k, v in coop.items()})
                # expose fused heads under plain names too (decode path)
                out.update(coop)
            else:
                out.update(self.heads(fused))
        else:
            if train:
                s1 = self.seg_head(ego)
                s2 = self.seg_head(fused)
                out.update({f"{k}1": v for k, v in s1.items()})
                out.update({f"{k}2": v for k, v in s2.items()})
                out.update(s2)
            else:
                out.update(self.seg_head(fused))
        out["comm_rate"] = rate
        return out
