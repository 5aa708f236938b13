"""CoAlign pose-robust collaboration (faithful twin of
models/point_pillar_coalign.py + coalign_modules/fusion_in_one.Att_w_Warp).

Forward (point_pillar_coalign.py:76-132): pillar encode -> per-level
ResNet features (optionally compressing the transmitted level-0 map) ->
per-level ego-warp + per-pixel agent self-attention (Att_w_Warp,
coalign_modules/fusion_in_one.py:434-461) -> multiscale deblock decode ->
shrink -> heads. The pairwise affine is normalized with the reference's
``normalize_pairwise_tfm`` convention (downsample_rate = 1 at the
spatial-feature resolution).

The pose-graph refinement (utils/pose_graph.refine_agent_poses — twin of
tools/pose_graph_pre_calc.py) runs on the host and corrects the noisy
``pairwise_t_full`` before the jitted step; the box-IoU-aware training
loss lives in loss.point_pillar_binary (coalign adds a rotated-IoU
regression term, loss/point_pillar_loss_coalign.py, via ops.rotated_iou).
"""

from __future__ import annotations

import jax.numpy as jnp

from airv2x_tpu.models.fusion.scope import atten_fusion
from airv2x_tpu.models.point_pillar_models import PointPillarBase
from airv2x_tpu.models.registry import register_model
from airv2x_tpu.ops.warp import (
    normalized_pairwise_affine,
    warp_affine_normalized,
)


@register_model("point_pillar_coalign")
class PointPillarCoAlign(PointPillarBase):
    def setup_fusion(self):
        # the reference yaml carries voxel_size in the model args
        # (opv2v_coalign.yaml); variants without it (e.g. _lrf) share the
        # preprocess grid.
        vs = self.args.get("voxel_size") or self.pre["args"]["voxel_size"]
        self._discrete_ratio = float(vs[0])

    def _compressor_width(self):
        bb = self.args.get("res_bev_backbone") or self.args["base_bev_backbone"]
        return int(bb["num_filters"][0])

    def __call__(self, batch, train: bool = False):
        spatial = self.encode(batch, train)  # (B, L, H0, W0, C)
        b, l = spatial.shape[:2]
        agent_mask = batch["agent_mask"]
        aff = normalized_pairwise_affine(
            batch["pairwise_t_full"], spatial.shape[2], spatial.shape[3],
            self._discrete_ratio, 1.0,
        )[:, 0]  # (B, L, 2, 3): slot j -> ego

        def warp_slots(v):
            warped = warp_affine_normalized(v[:, 1:], aff[:, 1:])
            out = jnp.concatenate([v[:, :1], warped], axis=1)
            return out * agent_mask[:, :, None, None, None].astype(out.dtype)

        # per-level features; the transmitted level-0 map is optionally
        # compressed before feeding deeper levels (:106-116)
        x = spatial.reshape((b * l,) + spatial.shape[2:])
        feats = []
        for i in range(len(self.backbone.stages)):
            x = self.backbone.stages[i](x, train)
            if i == 0 and self.compression:
                x = self.compressor(x, train)
            feats.append(x)

        fused_levels = []
        for i, f in enumerate(feats):
            fi = f.reshape((b, l) + f.shape[1:])
            fused_levels.append(atten_fusion(warp_slots(fi), agent_mask))
        ups = [
            self.backbone.deblocks[i](f, train)
            for i, f in enumerate(fused_levels)
        ]
        fused = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        if self.shrink_flag:
            fused = self.shrink_conv(fused, train)
        return {
            "psm": self.cls_head(fused),
            "rm": self.reg_head(fused),
            "comm_rate": jnp.asarray(1.0),
        }
