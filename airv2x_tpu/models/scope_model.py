"""Faithful SCOPE model (flax twin of models/point_pillar_scope.py +
scope_modules/scope_attn.py).

Temporal batch contract (temporal_models.py): per-frame arrays carry a
time axis; the LAST frame is current.

Forward (point_pillar_scope.py:147-289):
  1. every frame through pillar encoder + backbone + shrink (one shared
     encoder — the reference *constructs* a second pillar_vfe_2/scatter_2/
     backbone_2 but never calls them; the converter consumes their dead
     weights);
  2. temporal branch: each frame's ego 2d features warped into the current
     ego frame (the repo batch carries the explicit ``history_t``
     transform; the reference extracts the equivalent motion matrix from
     each delayed frame's pairwise slot [0, 1],
     point_pillar_scope.py:36-48) and fused by the pyramid-gated ConvLSTM
     (TemporalFusionLSTM) -> psm_temporal;
  3. collaboration (SCOPE fusion, scope_attn.py:96-208): confidence-mask
     communication at level 0 (even-slot quirk preserved), per-level
     ego-warp, per-level fusion (ATTEN / MAX / Deform — deformable query
     refinement sharing fusion/msda.py with How2comm), backbone deblocks,
     concat -> shrink -> psm_cross;
  4. late fusion: confidence-softmax blend of temporal / ego / cross maps
     -> final psm/rm; per-slot single outputs (psm_single_v/i) exposed for
     the SCOPE loss.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from airv2x_tpu.models.fusion.scope import (
    ScopeCommunication,
    ScopeLateFusion,
    TemporalFusionLSTM,
    atten_fusion,
    max_fusion,
)
from airv2x_tpu.models.fusion.msda import DeformableQueryRefine
from airv2x_tpu.models.point_pillar_models import PointPillarBase
from airv2x_tpu.models.registry import register_model
from airv2x_tpu.ops.warp import (
    normalized_pairwise_affine,
    warp_affine_normalized,
)


@register_model("point_pillar_scope")
class PointPillarScope(PointPillarBase):
    """SCOPE: spatio-temporal-collaborative perception with LSTM temporal
    fusion, confidence-masked collaboration and late confidence blending."""

    def setup_fusion(self):
        args = self.args
        fa = dict(args["fusion_args"])
        comm_cfg = dict(fa.get("communication", {}))
        gs = dict(comm_cfg.get("gaussian_smooth", {"k_size": 5, "c_sigma": 1.0}))
        self._k_size = int(gs.get("k_size", 5))
        self._c_sigma = float(gs.get("c_sigma", 1.0))
        self._thre = float(comm_cfg.get("thre", 0.01))
        self._has_comm = "communication" in fa
        self._agg_mode = str((fa.get("agg_operator") or {}).get("mode", "ATTEN"))
        self._discrete_ratio = float(fa["voxel_size"][0])
        self._downsample_rate = float(fa.get("downsample_rate", 1))
        self._num_filters = list(fa.get("num_filters", []))
        nq = int(fa.get("num_queries", 500))

        self.naive_communication = ScopeCommunication(
            thre=self._thre, k_size=self._k_size, c_sigma=self._c_sigma,
            name="naive_communication",
        )
        if self._agg_mode == "Deform":
            self.fuse_modules = [
                DeformableQueryRefine(
                    channels=int(f), n_points=9, num_queries=nq,
                    max_cav=self.layout.total, dtype=self.dtype,
                    name=f"deform_fuse_{i}",
                )
                for i, f in enumerate(self._num_filters)
            ]
        tf = dict(fa["temporal_fusion"])
        self.temporal_fusion = TemporalFusionLSTM(
            channel=int(tf["channel"]), height=int(tf["height"]),
            width=int(tf["width"]), dtype=self.dtype, name="temporal_fusion",
        )
        self.late_fusion = ScopeLateFusion(
            thre=self._thre, k_size=self._k_size, c_sigma=self._c_sigma,
            name="late_fusion",
        )

    def __call__(self, batch, train: bool = False):
        pts = batch["points"]  # (B, T, L, N, 4)
        b, t, l = pts.shape[:3]

        def frame_feats(i):
            fb = {
                "points": batch["points"][:, i],
                "points_mask": batch["points_mask"][:, i],
                "agent_mask": batch["agent_mask"][:, i],
            }
            if "radar_points" in batch:
                fb["radar_points"] = batch["radar_points"][:, i]
                fb["radar_points_mask"] = batch["radar_points_mask"][:, i]
            spatial = self.encode(fb, train)  # (B, L, ny, nx, C0)
            flat = spatial.reshape((b * l,) + spatial.shape[2:])
            f2d, _ = self.backbone(flat, train)
            if self.shrink_flag:
                f2d = self.shrink_conv(f2d, train)
            return spatial, f2d.reshape((b, l) + f2d.shape[1:])

        frames = [frame_feats(i) for i in range(t)]
        cur_spatial, cur_2d = frames[-1]
        agent_mask = batch["agent_mask"][:, -1]

        # 2. temporal branch over warped ego history (current first)
        ego_hist = jnp.stack(
            [frames[t - 1 - k][1][:, 0] for k in range(t)], axis=1
        )  # (B, T, h, w, C)
        from airv2x_tpu.models.fusion.temporal import warp_history_to_current

        hist_t = jnp.stack(
            [batch["history_t"][:, t - 1 - k] for k in range(t)], axis=1
        )
        ego_hist = warp_history_to_current(
            ego_hist, hist_t, self._discrete_ratio,
            self._downsample_rate * (cur_spatial.shape[2] // cur_2d.shape[2]),
        )
        temporal_output = self.temporal_fusion(ego_hist, train)
        psm_temporal = self.cls_head(temporal_output)

        flat_2d = cur_2d.reshape((b * l,) + cur_2d.shape[2:])
        psm_single = self.cls_head(flat_2d)
        rm_single = self.reg_head(flat_2d)
        psm_slots = psm_single.reshape((b, l) + psm_single.shape[1:])
        rm_slots = rm_single.reshape((b, l) + rm_single.shape[1:])

        # 3. SCOPE collaborative fusion over the current frame
        aff = normalized_pairwise_affine(
            batch["pairwise_t_full"][:, -1],
            cur_spatial.shape[2], cur_spatial.shape[3],
            self._discrete_ratio, self._downsample_rate,
        )[:, 0]  # (B, L, 2, 3)
        mask5 = agent_mask[:, :, None, None, None].astype(cur_spatial.dtype)

        def warp_slots(v):
            warped = warp_affine_normalized(v[:, 1:], aff[:, 1:])
            return jnp.concatenate([v[:, :1], warped], axis=1)

        comm_rate = jnp.asarray(0.0)
        x = cur_spatial
        if self._has_comm:
            comm_masks, comm_rate, deform_map = self.naive_communication(
                psm_slots, agent_mask
            )
            # mask applied at level 0 of the multiscale chain (:126-131)
            comm_masks_l0 = comm_masks

        x_flat = x.reshape((b * l,) + x.shape[2:])
        feats = (
            self.backbone.get_multiscale_feature(x_flat, train)
            if hasattr(self.backbone, "get_multiscale_feature")
            else None
        )
        if feats is None:
            feats, y = [], x_flat
            for i in range(len(self.backbone.stages)):
                y = self.backbone.stages[i](y, train)
                feats.append(y)

        ups = []
        for i in range(len(feats)):
            xi = feats[i].reshape((b, l) + feats[i].shape[1:])
            if i == 0 and self._has_comm:
                xi = xi * comm_masks_l0
            xi = warp_slots(xi) * mask5
            if self._agg_mode == "Deform":
                # reference quirk: the deform confidence maps are NOT
                # warped to ego (scope_attn.py:160-168), only
                # nearest-downsampled per level inside the RPN
                s = 2**i
                conf_i = deform_map[:, :, ::s, ::s]
                fused = self.fuse_modules[i](xi, conf_i)
            elif self._agg_mode == "MAX":
                fused = max_fusion(xi)
            else:
                fused = atten_fusion(xi, agent_mask)
            ups.append(self.backbone.deblocks[i](fused, train))

        x_fuse = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        if self.shrink_flag:
            x_fuse = self.shrink_conv(x_fuse, train)
        psm_cross = self.cls_head(x_fuse)

        # 4. late confidence blending
        final = self.late_fusion(
            [temporal_output, cur_2d[:, 0], x_fuse],
            psm_temporal, psm_slots[:, 0], psm_cross,
        )

        out = {
            "psm": self.cls_head(final),
            "rm": self.reg_head(final),
            "comm_rate": comm_rate,
            "psm_single_v": psm_slots[:, 0],
            "rm_single_v": rm_slots[:, 0],
        }
        if l > 1:
            out["psm_single_i"] = psm_slots[:, 1]
            out["rm_single_i"] = rm_slots[:, 1]
        return out
