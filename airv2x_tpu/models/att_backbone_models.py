"""Attention-backbone and SpatialCooper fusion variants.

``point_pillar_attresnet`` — twin of models/point_pillar_attresnet.py +
common_modules/att_bev_backbone.py:356-520: the BEV backbone fuses agents
with per-pixel self attention AFTER EVERY STAGE (fusion inside the
backbone, unlike the post-backbone family), deconvs the fused levels and
concatenates.

``point_pillar_spatialcooper`` — twin of point_pillar_spatialcooper.py +
spatialcooper_modules (max+mean stack -> 3D conv blend over agents).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from airv2x_tpu.models.bev_backbone import BEVStage, DeconvBNReLU
from airv2x_tpu.models.fusion.common import ego_agent_attention, max_fusion, mean_fusion
from airv2x_tpu.models.point_pillar_models import PointPillarBase
from airv2x_tpu.models.registry import register_model


@register_model("point_pillar_attresnet", "PFA_net", "pfanet")
class PointPillarAttResNet(PointPillarBase):
    def setup_fusion(self):
        bb = self.args["base_bev_backbone"]
        self.att_stages = [
            BEVStage(f, s, n, dtype=self.dtype)
            for f, s, n in zip(
                bb["num_filters"], bb["layer_strides"], bb["layer_nums"]
            )
        ]
        self.att_deblocks = [
            DeconvBNReLU(f, s, dtype=self.dtype)
            for f, s in zip(bb["num_upsample_filter"], bb["upsample_strides"])
        ]
        # att_bev_backbone.py:13-17,51-76: ``compression: N`` inserts an
        # AutoEncoder bottleneck after stage idx while N - idx > 0
        compress_layer = int(bb.get("compression", 0))
        if compress_layer > 0:
            from airv2x_tpu.models.alignnet import AutoEncoder

            self.att_compressors = [
                AutoEncoder(f, compress_layer - i, dtype=self.dtype)
                if compress_layer - i > 0
                else None
                for i, f in enumerate(bb["num_filters"])
            ]
        else:
            self.att_compressors = [None] * len(bb["num_filters"])

    def __call__(self, batch, train: bool = False):
        x = self.encode(batch, train)  # (B, L, ny, nx, C)
        b, l = x.shape[:2]
        am = batch["agent_mask"]
        cur = x.reshape((b * l,) + x.shape[2:])
        ups = []
        for stage, deblock, compressor in zip(
            self.att_stages, self.att_deblocks, self.att_compressors
        ):
            cur = stage(cur, train)
            if compressor is not None:
                cur = compressor(cur, train)
            grouped = cur.reshape((b, l) + cur.shape[1:])
            fused = ego_agent_attention(grouped, am)  # (B, H, W, C)
            ups.append(deblock(fused, train))
        feats = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        if self.shrink_flag:
            feats = self.shrink_conv(feats, train)
        return {
            "psm": self.cls_head(feats),
            "rm": self.reg_head(feats),
            "comm_rate": jnp.asarray(1.0),
        }


@register_model("point_pillar_spatialcooper", "point_pillar_spatialcooper_lrf")
class PointPillarSpatialCooper(PointPillarBase):
    """Max+mean agent stack blended by a learned conv
    (spatialcooper_modules twin)."""

    def setup_fusion(self):
        self.blend = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype,
                             name="spatial_blend")

    def fuse(self, grouped, batch, train):
        am = batch["agent_mask"]
        x_max = max_fusion(grouped, am)
        x_mean = mean_fusion(grouped, am)
        gate = nn.sigmoid(
            self.blend(jnp.concatenate([x_max, x_mean], axis=-1))
        )
        return gate * x_max + (1.0 - gate) * x_mean, jnp.asarray(1.0)
