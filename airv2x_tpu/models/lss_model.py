"""Camera-only single/ego LSS model (twin of models/lift_splat_shoot_airv2x.py).

Single-agent camera BEV perception: LSS encoder -> BEV backbone -> det/seg
heads. Used for camera-only baselines and as the per-agent pretraining
stage of the camera HEAL/STAMP recipes.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from airv2x_tpu.models.bev_backbone import BaseBEVBackbone
from airv2x_tpu.models.camera.lss import LSSCameraEncoder
from airv2x_tpu.models.heads import BevSegHead, DetectionHeads
from airv2x_tpu.models.nn import DownsampleConv
from airv2x_tpu.models.registry import register_model


@register_model("lift_splat_shoot_airv2x", "lift_splat_shoot")
class LiftSplatShoot(nn.Module):
    args: dict
    dtype: Any = jnp.float32

    def setup(self):
        args = self.args
        ego = args.get("ego_type", "vehicle")
        self.cam_encoder = LSSCameraEncoder(
            cfg=args[ego]["cam"], dtype=self.dtype, name="lss_encoder"
        )
        bb = (args.get("modality_fusion") or args)["base_bev_backbone"]
        self.backbone = BaseBEVBackbone(
            layer_nums=bb["layer_nums"],
            layer_strides=bb["layer_strides"],
            num_filters=bb["num_filters"],
            upsample_strides=bb["upsample_strides"],
            num_upsample_filters=bb["num_upsample_filter"],
            dtype=self.dtype,
        )
        shrink = args["modality_fusion"].get("shrink_header", {})
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
        ego = self.args.get("ego_type", "vehicle")
        cam = batch[f"cam_{ego}"]
        # ego camera only: slot 0
        cam_inputs = {k: v[:, 0] for k, v in cam.items()}
        bev = self.cam_encoder(cam_inputs, train)  # (B, ny, nx, C)
        feats, _ = self.backbone(bev, train)
        if self.shrink_flag:
            feats = self.shrink_conv(feats, train)
        if self.task == "det":
            out = dict(self.heads(feats))
        else:
            out = dict(self.seg_head(feats))
        out["comm_rate"] = jnp.asarray(0.0)
        return out
