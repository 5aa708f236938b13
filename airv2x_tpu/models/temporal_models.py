"""Multi-frame temporal collaboration models (SCOPE / How2comm family).

Batch contract extension: every per-frame array gains a leading time axis
after batch — ``points (B, T, L, N, 4)``, ``points_mask (B, T, L, N)``,
``agent_mask (B, T, L)``, ``pairwise_t_full (B, T, L, L, 4, 4)`` and
``history_t (B, T, 4, 4)`` (history-ego -> current-ego transforms). The
last frame (index T-1) is the current one; labels reference it — matching
the reference's K-frame dataset lists
(intermediate_fusion_dataset_multi_frame_how2comm.py:28,93-104).

Structure (point_pillar_scope.py:147+): per-frame encoding + backbone
(frames share weights), history ego features warped to the current frame
and fused by a ConvLSTM, agent attention fusion on the current frame, and a
gated combination. The faithful How2comm model (flow compensation + mutual
communication + STCFormer) lives in how2comm_model.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from airv2x_tpu.models.fusion.common import ego_agent_attention
from airv2x_tpu.models.fusion.temporal import (
    TemporalLateFusion,
    TemporalLSTMFusion,
    warp_history_to_current,
)
from airv2x_tpu.models.point_pillar_models import PointPillarBase
from airv2x_tpu.models.registry import register_model


class _TemporalBase(PointPillarBase):
    def setup_fusion(self):
        tcfg = self.args.get("temporal_fusion", {})
        ch = int(tcfg.get("channels", 256))
        method = tcfg.get("method", "lstm")
        if method == "late":
            self.temporal_net = TemporalLateFusion(dtype=self.dtype)
        else:
            self.temporal_net = TemporalLSTMFusion(channels=ch, dtype=self.dtype)
        self._tcfg = tcfg
        self._tmethod = method
        # point_pillar_how2comm.py:205-207 / point_pillar_scope.py:184-186:
        # optional deformable refinement of the per-frame 2d features
        if "dcn" in self.args:
            from airv2x_tpu.models.alignnet import DCNNet

            self.dcn_net = DCNNet(cfg=dict(self.args["dcn"]), dtype=self.dtype)
        else:
            self.dcn_net = None

    def __call__(self, batch, train: bool = False):
        pts = batch["points"]  # (B, T, L, N, 4)
        b, t, l = pts.shape[:3]

        def frame(i):
            fb = {
                "points": batch["points"][:, i],
                "points_mask": batch["points_mask"][:, i],
                "agent_mask": batch["agent_mask"][:, i],
            }
            # the _lrf concat variants carry a per-frame radar cloud too
            if "radar_points" in batch:
                fb["radar_points"] = batch["radar_points"][:, i]
                fb["radar_points_mask"] = batch["radar_points_mask"][:, i]
            x = self.encode(fb, train)
            flat = x.reshape((b * l,) + x.shape[2:])
            feats, _ = self.backbone(flat, train)
            if self.shrink_flag:
                feats = self.shrink_conv(feats, train)
            if self.dcn_net is not None:
                feats = self.dcn_net(feats, train)
            return feats.reshape((b, l) + feats.shape[1:])

        frames = [frame(i) for i in range(t)]  # static unroll (small T)

        # temporal branch on the ego agent
        ego_hist = jnp.stack([f[:, 0] for f in frames], axis=1)  # (B, T, H, W, C)
        ego_hist = warp_history_to_current(
            ego_hist,
            batch["history_t"],
            self._tcfg.get("discrete_ratio", 0.4),
            self._tcfg.get("downsample_rate", 2),
        )
        # collaboration on the current frame
        cur = frames[-1]

        temporal = self.temporal_net(ego_hist, train)
        fused = ego_agent_attention(cur, batch["agent_mask"][:, -1])
        out_feat = 0.5 * (temporal + fused)
        return {
            "psm": self.cls_head(out_feat),
            "rm": self.reg_head(out_feat),
            "comm_rate": jnp.asarray(1.0),
        }


@register_model("point_pillar_scope")
class PointPillarScope(_TemporalBase):
    """SCOPE-style temporal + collaborative fusion."""

