"""Airv2x Where2comm model (TPU twin of models/airv2x_where2com.py).

Pipeline (reference forward :117-227): hetero encode -> shared BEV backbone
-> shrink -> single-agent confidence heads -> Where2comm fusion (multiscale,
sharing backbone stage weights) -> shrink -> det heads or seg head.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from airv2x_tpu.models.base import HeteroLidarEncoder, SlotLayout
from airv2x_tpu.models.bev_backbone import BaseBEVBackbone
from airv2x_tpu.models.fusion.where2comm import Where2commFusion
from airv2x_tpu.models.heads import BevSegHead, DetectionHeads
from airv2x_tpu.models.nn import DownsampleConv, NaiveCompressor
from airv2x_tpu.models.registry import register_model


@register_model("airv2x_where2comm", "airv2x_where2com")
class Airv2xWhere2comm(nn.Module):
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
                paddings=shrink.get("padding"),
                dtype=self.dtype,
            )
        self.compression = int(mod.get("compression", 0)) > 0
        if self.compression:
            self.compressor = NaiveCompressor(256, mod["compression"], dtype=self.dtype)

        w2c = args["where2com_fusion"]
        comm = w2c.get("communication", {})
        gauss = comm.get("gaussian_smooth")
        # remat: recomputing the fusion forward in the backward both saves
        # HBM and sidesteps an XLA TPU crash (SIGABRT in the HLO pass
        # pipeline) when differentiating the multi-scale fusion inside the
        # seg graph.
        fusion_cls = nn.remat(Where2commFusion, static_argnums=(4, 5)) \
            if self.args.get("task") == "seg" else Where2commFusion
        self.fusion_net = fusion_cls(
            multi_scale=w2c["multi_scale"],
            fully=w2c["fully"],
            threshold=comm.get("threshold", 0.01),
            smooth=gauss is not None,
            k_size=gauss["k_size"] if gauss else 5,
            c_sigma=gauss["c_sigma"] if gauss else 1.0,
            # where2comm_attn.py variant: projected multi-head per-pixel
            # attention instead of the unprojected ego-query fusion.
            attn_heads=int(w2c.get("attn_heads", 0)),
            dtype=self.dtype,
        )
        self.multi_scale = w2c["multi_scale"]

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

        feats_2d, _ = self.backbone(flat, train)  # (B*L, H', W', 384)
        if self.shrink_flag:
            feats_2d = self.shrink_conv(feats_2d, train)

        out = {}
        if self.task == "det":
            psm_single = self.heads(feats_2d)["psm"]  # (B*L, H', W', A*C)
            feats_for_fusion = feats_2d
            if self.compression:
                feats_for_fusion = self.compressor(feats_for_fusion, train)

            psm_grouped = psm_single.reshape((b, l) + psm_single.shape[1:])
            if self.multi_scale:
                fused, rate = self.fusion_net(
                    x, psm_grouped, batch["agent_mask"], self.backbone, train
                )
                if self.shrink_flag:
                    fused = self.shrink_conv(fused, train)
            else:
                grouped = feats_for_fusion.reshape((b, l) + feats_for_fusion.shape[1:])
                fused, rate = self.fusion_net(
                    grouped, psm_grouped, batch["agent_mask"], None, train
                )

            out.update(self.heads(fused))
            out["comm_rate"] = rate
        else:
            _, ori_feats = self.seg_head(feats_2d, return_features=True)
            conf = ori_feats  # confidence proxy for communication, as reference
            conf_grouped = conf.reshape((b, l) + conf.shape[1:])
            if self.multi_scale:
                fused, rate = self.fusion_net(
                    x, conf_grouped, batch["agent_mask"], self.backbone, train
                )
                if self.shrink_flag:
                    fused = self.shrink_conv(fused, train)
            else:
                grouped = feats_2d.reshape((b, l) + feats_2d.shape[1:])
                fused, rate = self.fusion_net(
                    grouped, conf_grouped, batch["agent_mask"], None, train
                )
            out.update(self.seg_head(fused))
            out["comm_rate"] = rate
        return out
