"""CoAlign pose-robust collaboration (twin of point_pillar_coalign.py).

The pose-graph refinement (utils/pose_graph.refine_agent_poses — twin of
tools/pose_graph_pre_calc.py) runs on the host and corrects the noisy
``pairwise_t_full`` before the jitted step; the model itself warps every
agent's BEV features into the ego frame with the refined transforms and
fuses with ego-query attention — the box-IoU-aware training loss lives in
loss.point_pillar_binary (coalign adds a rotated-IoU regression term,
loss/point_pillar_loss_coalign.py, via ops.rotated_iou).
"""

from __future__ import annotations

import jax.numpy as jnp

from airv2x_tpu.models.fusion.common import ego_agent_attention
from airv2x_tpu.models.point_pillar_models import PointPillarBase
from airv2x_tpu.models.registry import register_model
from airv2x_tpu.ops.warp import normalized_pairwise_affine, warp_affine_normalized


@register_model("point_pillar_coalign")
class PointPillarCoAlign(PointPillarBase):
    def setup_fusion(self):
        cfg = self.args.get("coalign_fusion", {})
        self._discrete_ratio = float(cfg.get("discrete_ratio", 0.4))
        self._downsample = float(cfg.get("downsample_rate", 2))

    def fuse(self, grouped, batch, train):
        h, w = grouped.shape[2], grouped.shape[3]
        aff = normalized_pairwise_affine(
            batch["pairwise_t_full"][:, 0],  # senders -> ego
            h,
            w,
            self._discrete_ratio,
            self._downsample,
        )
        warped = warp_affine_normalized(grouped, aff)
        return ego_agent_attention(warped, batch["agent_mask"]), jnp.asarray(1.0)
