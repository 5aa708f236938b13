"""Faithful How2comm model (flax twin of models/point_pillar_how2comm.py +
how2comm_modules/how2comm_deformable.py).

Temporal batch contract (see temporal_models.py): per-frame arrays carry a
time axis after batch; the LAST frame is current, ``delay`` frames back is
the transmitted history (the reference's data_dict_list[0] = current,
[delay] = history).

Forward (how2comm_deformable.How2comm.forward :58-271):
  1. per-frame pillar encode -> scatter (spatial features, C=64);
  2. current frame through the full backbone + shrink -> single-agent
     confidences ``psm_single``;
  3. flow preprocess (``flow_flag``): FlowGenerator estimates each
     collaborator's current features from [history, current] pairs
     (ego keeps its true current features);
  4. confidence maps from psm_single (communication.py), warped to ego;
  5. level-0: features + history warped to ego, mutual-communication
     sparsification (``communication_flag``) + 7x7 channel_fuse. NOTE two
     reference quirks preserved: the sparse "history" takes the sparse
     *current* collaborator features (how2comm_preprocess.py:60-66), and
     the level-0 sparsification does NOT propagate to deeper levels (the
     level loop re-reads the pre-computed resnet features,
     how2comm_deformable.py:105-110);
  6. per level: warp slot maps to ego (levels > 0), STCFormer fusion
     (decoupling + temporal attention + deformable query refinement +
     late fusion), backbone deblocks, concat;
  7. shrink + detection heads.

Outputs include ``offset_loss`` (flow) and ``commu_loss`` (DeepInfoMax)
for the How2comm training objective.
"""

from __future__ import annotations

import jax.numpy as jnp

from airv2x_tpu.models.fusion.how2comm import (
    FlowGenerator,
    MutualCommunication,
    confidence_maps,
)
from airv2x_tpu.models.fusion.stcformer import STCFormer
from airv2x_tpu.models.point_pillar_models import PointPillarBase
from airv2x_tpu.models.registry import register_model
from airv2x_tpu.ops.warp import normalized_pairwise_affine, warp_affine_normalized

import flax.linen as nn


@register_model("point_pillar_how2comm")
class PointPillarHow2comm(PointPillarBase):
    """How2comm: flow-compensated, mutually-communicated, decoupled
    deformable temporal collaboration."""

    def setup_fusion(self):
        args = self.args
        fa = dict(args["fusion_args"])
        comm_cfg = dict(fa.get("communication", {}))
        gs = dict(comm_cfg.get("gaussian_smooth", {"k_size": 5, "c_sigma": 1.0}))
        self._k_size = int(gs.get("k_size", 5))
        self._c_sigma = float(gs.get("c_sigma", 1.0))
        self._thre = float(comm_cfg.get("thre", 0.01))
        self._flow_flag = bool(args.get("flow_flag", True))
        self._comm_flag = bool(fa.get("communication_flag", True))
        self._delay = int(args.get("delay", 1))
        self._discrete_ratio = float(fa["voxel_size"][0])
        self._downsample_rate = float(fa.get("downsample_rate", 1))
        nq = int(fa.get("num_queries", 500))
        self._num_filters = list(fa["num_filters"])

        scatter = args.get("point_pillar_scatter") or {}
        ch0 = int(
            scatter.get("num_features", args["pillar_vfe"]["num_filters"][-1])
        )
        self._ch0 = ch0
        self.flow = FlowGenerator(
            backbone_cfg=dict(args["base_bev_backbone"]),
            channel=ch0,
            dtype=self.dtype,
            name="flow",
        )
        self.commu_module = MutualCommunication(
            in_planes=ch0,
            thre=self._thre,
            request_flag=bool(comm_cfg.get("request_flag", True)),
            k_size=self._k_size,
            c_sigma=self._c_sigma,
            dtype=self.dtype,
            name="commu_module",
        )
        self.channel_fuse = nn.Conv(
            ch0, (7, 7), padding=[(3, 3), (3, 3)], dtype=self.dtype,
            name="channel_fuse",
        )
        self.fuse_modules = [
            STCFormer(
                channels=int(f), level=i, num_queries=nq,
                max_cav=self.layout.total, dtype=self.dtype,
                name=f"stcformer_{i}",
            )
            for i, f in enumerate(self._num_filters)
        ]

    def __call__(self, batch, train: bool = False):
        pts = batch["points"]  # (B, T, L, N, 4)
        b, t, l = pts.shape[:3]

        def frame_spatial(i):
            fb = {
                "points": batch["points"][:, i],
                "points_mask": batch["points_mask"][:, i],
                "agent_mask": batch["agent_mask"][:, i],
            }
            if "radar_points" in batch:
                fb["radar_points"] = batch["radar_points"][:, i]
                fb["radar_points_mask"] = batch["radar_points_mask"][:, i]
            return self.encode(fb, train)  # (B, L, ny, nx, 64)

        cur = frame_spatial(t - 1)
        hist = frame_spatial(max(t - 1 - self._delay, 0))
        agent_mask = batch["agent_mask"][:, -1]

        # single-agent branch: full backbone + shrink -> psm_single
        flat_cur = cur.reshape((b * l,) + cur.shape[2:])
        feats_2d, _ = self.backbone(flat_cur, train)
        if self.shrink_flag:
            feats_2d = self.shrink_conv(feats_2d, train)
        psm_single = self.cls_head(feats_2d)  # (B*L, h2, w2, A)

        # 3. flow-based delay compensation
        if self._flow_flag:
            x, offset_loss = self.flow(cur, hist, agent_mask, train)
        else:
            x, offset_loss = cur, jnp.zeros(())
        his = hist

        # pairwise ego-warp affines, normalized at the spatial resolution
        aff = normalized_pairwise_affine(
            batch["pairwise_t_full"][:, -1],
            cur.shape[2], cur.shape[3],
            self._discrete_ratio, self._downsample_rate,
        )[:, 0]  # (B, L, 2, 3): slot j -> ego

        def warp_slots(v):
            warped = warp_affine_normalized(v[:, 1:], aff[:, 1:])
            return jnp.concatenate([v[:, :1], warped], axis=1)

        # resnet level features for the fused + history branches
        def level_feats(v):
            flat = v.reshape((b * l,) + v.shape[2:])
            if hasattr(self.backbone, "get_multiscale_feature"):
                return self.backbone.get_multiscale_feature(flat, train)
            feats, y = [], flat
            for i in range(len(self.backbone.stages)):
                y = self.backbone.stages[i](y, train)
                feats.append(y)
            return feats

        x_levels = level_feats(x)
        his_levels = level_feats(his)

        # 4. confidence maps (level-0 resolution), warped to ego
        psm_slots = psm_single.reshape((b, l) + psm_single.shape[1:])
        conf = confidence_maps(psm_slots, self._k_size, self._c_sigma)
        conf = warp_slots(conf)
        mask5 = agent_mask[:, :, None, None, None].astype(conf.dtype)
        conf = conf * mask5

        comm_rate = jnp.asarray(0.0)
        commu_loss = jnp.zeros(())
        ups = []
        for i in range(len(x_levels)):
            xi = x_levels[i].reshape((b, l) + x_levels[i].shape[1:])
            hisi = his_levels[i].reshape((b, l) + his_levels[i].shape[1:])
            xi = warp_slots(xi) * mask5
            hisi = warp_slots(hisi) * mask5
            if i == 0 and self._comm_flag:
                sparse, commu_loss, comm_rate, _ = self.commu_module(
                    xi, agent_mask, train
                )
                # sparse "history": ego history + sparse current neighbors
                # (how2comm_preprocess.py:60-66)
                sparse_hist = jnp.concatenate(
                    [hisi[:, :1], sparse[:, 1:]], axis=1
                )
                flat = sparse.reshape((b * l,) + sparse.shape[2:])
                xi = self.channel_fuse(flat).reshape(sparse.shape)
                flat_h = sparse_hist.reshape((b * l,) + sparse_hist.shape[2:])
                hisi = self.channel_fuse(flat_h).reshape(sparse_hist.shape)
            fused, _branches = self.fuse_modules[i](
                xi, conf, hisi, agent_mask, train
            )
            ups.append(self.backbone.deblocks[i](fused, train))

        x_fuse = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        if self.shrink_flag:
            x_fuse = self.shrink_conv(x_fuse, train)

        return {
            "psm": self.cls_head(x_fuse),
            "rm": self.reg_head(x_fuse),
            "comm_rate": comm_rate,
            "offset_loss": offset_loss,
            "commu_loss": commu_loss,
        }
