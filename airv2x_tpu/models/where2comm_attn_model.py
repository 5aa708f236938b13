"""point_pillar_where2comm_bm2cp (flax twin of
models/point_pillar_where2comm_bm2cp.py): the flat where2comm variant built
on where2comm_modules/where2comm_attn.Where2comm — confidence-mask
communication (where2comm_modules/where2comm.Communication, the same
even-slot quirk as SCOPE's), multi-scale per-level ego-warp and
ATTEN / MAX / Transformer aggregation.
"""

from __future__ import annotations

import jax.numpy as jnp

from airv2x_tpu.models.fusion.scope import (
    ScopeCommunication,
    atten_fusion,
    max_fusion,
)
from airv2x_tpu.models.fusion.where2comm_attn import TransformerFusion
from airv2x_tpu.models.point_pillar_models import PointPillarBase
from airv2x_tpu.models.registry import register_model
from airv2x_tpu.ops.warp import (
    normalized_pairwise_affine,
    warp_affine_normalized,
)


@register_model("point_pillar_where2comm_bm2cp")
class PointPillarWhere2commAttn(PointPillarBase):
    def setup_fusion(self):
        fa = dict(self.args["fusion_args"])
        comm_cfg = dict(fa.get("communication", {}))
        gs = dict(comm_cfg.get("gaussian_smooth", {"k_size": 5, "c_sigma": 1.0}))
        self._has_comm = "communication" in fa
        self._agg_mode = str((fa.get("agg_operator") or {}).get("mode", "ATTEN"))
        self._discrete_ratio = float(fa["voxel_size"][0])
        self._downsample_rate = float(fa.get("downsample_rate", 1))
        self._multi_scale = bool(fa.get("multi_scale", True))
        self.naive_communication = ScopeCommunication(
            thre=float(comm_cfg.get("thre", 0.01)),
            k_size=int(gs.get("k_size", 5)),
            c_sigma=float(gs.get("c_sigma", 1.0)),
            name="naive_communication",
        )
        if self._agg_mode == "Transformer":
            agg = fa["agg_operator"]
            filters = (
                list(fa.get("num_filters", []))
                if self._multi_scale
                else [int(agg["feature_dim"])]
            )
            self.fuse_modules = [
                TransformerFusion(
                    channels=int(f),
                    n_head=int(agg.get("n_head", 8)),
                    with_spe=bool(agg.get("with_spe", True)),
                    dtype=self.dtype,
                    name=f"transformer_fuse_{i}",
                )
                for i, f in enumerate(filters)
            ]

    def _fuse_level(self, i, xi, agent_mask):
        if self._agg_mode == "MAX":
            return max_fusion(xi)
        if self._agg_mode == "Transformer":
            return self.fuse_modules[i](xi, agent_mask)
        return atten_fusion(xi, agent_mask)

    def __call__(self, batch, train: bool = False):
        spatial = self.encode(batch, train)  # (B, L, H, W, C)
        b, l = spatial.shape[:2]
        agent_mask = batch["agent_mask"]
        mask5 = agent_mask[:, :, None, None, None].astype(spatial.dtype)
        aff = normalized_pairwise_affine(
            batch["pairwise_t_full"], spatial.shape[2], spatial.shape[3],
            self._discrete_ratio, self._downsample_rate,
        )[:, 0]

        def warp_slots(v):
            warped = warp_affine_normalized(v[:, 1:], aff[:, 1:])
            return jnp.concatenate([v[:, :1], warped], axis=1)

        flat = spatial.reshape((b * l,) + spatial.shape[2:])
        feats_2d, _ = self.backbone(flat, train)
        if self.shrink_flag:
            feats_2d = self.shrink_conv(feats_2d, train)
        psm_single = self.cls_head(feats_2d)
        psm_slots = psm_single.reshape((b, l) + psm_single.shape[1:])

        comm_rate = jnp.asarray(0.0)
        if self._has_comm:
            comm_masks, comm_rate, _ = self.naive_communication(
                psm_slots, agent_mask
            )

        if self._multi_scale:
            feats = (
                self.backbone.get_multiscale_feature(flat, train)
                if hasattr(self.backbone, "get_multiscale_feature")
                else None
            )
            if feats is None:
                feats, y = [], flat
                for i in range(len(self.backbone.stages)):
                    y = self.backbone.stages[i](y, train)
                    feats.append(y)
            ups = []
            for i in range(len(feats)):
                xi = feats[i].reshape((b, l) + feats[i].shape[1:])
                if i == 0 and self._has_comm:
                    xi = xi * comm_masks
                xi = warp_slots(xi) * mask5
                ups.append(
                    self.backbone.deblocks[i](
                        self._fuse_level(i, xi, agent_mask), train
                    )
                )
            fused = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
            if self.shrink_flag:
                fused = self.shrink_conv(fused, train)
        else:
            f2d = feats_2d.reshape((b, l) + feats_2d.shape[1:])
            if self._has_comm:
                f2d = f2d * comm_masks
            fused = self._fuse_level(0, warp_slots(f2d) * mask5, agent_mask)

        return {
            "psm": self.cls_head(fused),
            "rm": self.reg_head(fused),
            "comm_rate": comm_rate,
        }
