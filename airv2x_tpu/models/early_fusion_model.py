"""Early-fusion PointPillars (twin of the EarlyFusionDataset* + point_pillar
pipeline: all agents' ego-frame clouds merged into one, single encoder).

With the dense slot layout, "merging" is just flattening the agent axis of
the padded point tensor into the point axis — the pillarizer's masks absorb
everything else (airv2x early_fusion_dataset.py:59-170 does the projection
+ concatenation on the host; here points are already ego-frame when
proj_first).
"""

from __future__ import annotations

import jax.numpy as jnp

from airv2x_tpu.models.point_pillar_models import PointPillarBase
from airv2x_tpu.models.registry import register_model


@register_model("point_pillar_early", "airv2x_early")
class PointPillarEarly(PointPillarBase):
    def encode(self, batch, train):
        pts = batch["points"]  # (B, L, N, 4)
        b, l, n, f = pts.shape
        merged = {
            "points": pts.reshape(b, 1, l * n, f),
            "points_mask": (
                batch["points_mask"]
                & batch["agent_mask"][..., None]
            ).reshape(b, 1, l * n),
            "agent_mask": jnp.ones((b, 1), bool),
        }
        return super().encode(merged, train)

    def fuse(self, grouped, batch, train):
        return grouped[:, 0], jnp.asarray(0.0)

@register_model("point_pillar_disconet_teacher")
class PointPillarDiscoNetTeacher(PointPillarEarly):
    """Frozen early-fusion KD teacher (point_pillar_disconet_teacher.py:
    14-57): PointPillars on the merged ego-frame cloud, emitting the
    pre-head BEV map as ``teacher_feature`` plus teacher psm/rm."""

    def __call__(self, batch, train: bool = False):
        x = self.encode(batch, train)
        b, l = x.shape[:2]
        flat = x.reshape((b * l,) + x.shape[2:])
        feats, _ = self.backbone(flat, train)
        if self.shrink_flag:
            feats = self.shrink_conv(feats, train)
        if self.compression:
            feats = self.compressor(feats, train)
        fused = feats.reshape((b, l) + feats.shape[1:])[:, 0]
        psm, rm = self.cls_head(fused), self.reg_head(fused)
        # psm/rm aliases keep the generic train/inference tools usable on
        # the teacher checkpoint itself
        return {
            "teacher_feature": fused,
            "teacher_psm": psm,
            "teacher_rm": rm,
            "psm": psm,
            "rm": rm,
            "comm_rate": jnp.asarray(0.0),
        }
