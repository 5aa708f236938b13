"""Attention-backbone, PFA and SpatialCooper fusion variants.

``point_pillar_attresnet`` — faithful twin of models/point_pillar_attresnet
.py (PointPillarIntermediateResNetDCN) + attresnet_modules/: ResNetModified
multiscale features (att_resnet_bev_backbone.py:189), per level an
ego-warp + per-pixel agent self-attention (self_attn.AttFusion:50-78 —
``warp_affine_simple`` to the ego frame with the normalized affine built at
the spatial-feature resolution, :252-268, then scaled-dot attention keeping
the ego row), ConvTranspose deblock decode, 1x1 heads on 128*3
(point_pillar_attresnet.py:29-32). The structure is CoAlign's fusion spine
(coalign_model.py) with the reference's hardcoded no-compression backbone
(att_resnet_bev_backbone.py:177 ``self.compress = False``).

``PFA_net`` — models/PFA_net.py: the standard common_modules
AttBEVBackbone per-stage fusion model, with ``use_modality`` selecting
which processed cloud feeds the pillars (:14-16, V2X-R radar-only runs).

``point_pillar_spatialcooper`` — twin of point_pillar_spatialcooper.py +
spatialcooper_modules (max+mean stack -> learned conv blend over agents).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from airv2x_tpu.models.fusion.common import max_fusion, mean_fusion
from airv2x_tpu.models.fusion.scope import atten_fusion
from airv2x_tpu.models.point_pillar_models import (
    PointPillarBase,
    PointPillarIntermediate,
)
from airv2x_tpu.models.registry import register_model
from airv2x_tpu.ops.warp import (
    normalized_pairwise_affine,
    warp_affine_normalized,
)


@register_model("point_pillar_attresnet")
class PointPillarAttResNet(PointPillarBase):
    """ResNet multiscale + per-level ego-warp agent attention."""

    _force_resnet_backbone = True

    def setup_fusion(self):
        vs = self.args.get("voxel_size") or self.pre["args"]["voxel_size"]
        self._discrete_ratio = float(vs[0])

    def __call__(self, batch, train: bool = False):
        spatial = self.encode(batch, train)  # (B, L, H0, W0, C)
        b, l = spatial.shape[:2]
        agent_mask = batch["agent_mask"]
        # normalized once at the spatial-feature resolution and shared by
        # all levels (att_resnet_bev_backbone.py:252-268; downsample_rate=1)
        aff = normalized_pairwise_affine(
            batch["pairwise_t_full"], spatial.shape[2], spatial.shape[3],
            self._discrete_ratio, 1.0,
        )[:, 0]  # (B, L, 2, 3): slot j -> ego

        def warp_slots(v):
            warped = warp_affine_normalized(v[:, 1:], aff[:, 1:])
            out = jnp.concatenate([v[:, :1], warped], axis=1)
            return out * agent_mask[:, :, None, None, None].astype(out.dtype)

        x = spatial.reshape((b * l,) + spatial.shape[2:])
        ups = []
        for i in range(len(self.backbone.stages)):
            x = self.backbone.stages[i](x, train)
            fi = x.reshape((b, l) + x.shape[1:])
            fused = atten_fusion(warp_slots(fi), agent_mask)
            ups.append(self.backbone.deblocks[i](fused, train))
        feats = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        if self.shrink_flag:
            feats = self.shrink_conv(feats, train)
        return {
            "psm": self.cls_head(feats),
            "rm": self.reg_head(feats),
            "comm_rate": jnp.asarray(1.0),
        }


@register_model("PFA_net", "pfanet", "pfa_net")
class PFAnet(PointPillarIntermediate):
    """AttBEVBackbone per-stage fusion on a configurable cloud modality."""

    def encode(self, batch, train):
        if str(self.args.get("use_modality", "")) == "processed_radar":
            batch = dict(batch)
            batch["points"] = batch["radar_points"]
            batch["points_mask"] = batch["radar_points_mask"]
        return super().encode(batch, train)


@register_model("point_pillar_spatialcooper", "point_pillar_adafusion")
class PointPillarSpatialCooper(PointPillarBase):
    """Faithful S-AdaFusion twin (spatialcooper_modules/spatial_cooper_fuse
    .SpatialFusion:10-35): the per-agent max and mean maps stack as TWO
    channels of a 3D volume whose spatial dims are (feature-channel, H, W);
    a Conv3d(2->1, k3, pad 1) + ReLU blends them. The ``use_modality``
    hook selects the encoded cloud (point_pillar_spatialcooper.py:23-25);
    the `_lrf` variant is the lidar+radar concat build via _make_lrf."""

    def setup_fusion(self):
        self.fuse_conv3d = nn.Conv(
            1, (3, 3, 3), padding="SAME", dtype=self.dtype,
            name="spatial_fuse3d",
        )

    def encode(self, batch, train):
        if str(self.args.get("use_modality", "")) == "processed_radar":
            batch = dict(batch)
            batch["points"] = batch["radar_points"]
            batch["points_mask"] = batch["radar_points_mask"]
        return super().encode(batch, train)

    def fuse(self, grouped, batch, train):
        am = batch["agent_mask"]
        x_max = max_fusion(grouped, am)   # (B, H, W, C)
        x_mean = mean_fusion(grouped, am)
        # (B, C, H, W, 2): feature axis becomes the leading 3D spatial dim
        vol = jnp.stack([x_max, x_mean], axis=-1).transpose(0, 3, 1, 2, 4)
        out = nn.relu(self.fuse_conv3d(vol))[..., 0]  # (B, C, H, W)
        return out.transpose(0, 2, 3, 1), jnp.asarray(1.0)
