"""OPV2V / DAIR-V2X / V2X-R ``point_pillar_*`` model family.

Homogeneous (vehicle-only) PointPillars with one shared encoder and the
fusion_in_one-style collaboration heads (reference models/point_pillar*.py +
fuse_modules/fusion_in_one.py). Binary-class heads: psm = anchor_num
channels, rm = 7 * anchor_num, no obj head — matching the OPV2V family.

The dense agent-axis layout reuses SlotLayout with all slots typed
'vehicle'; all AirV2X fusion modules plug in unchanged.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from airv2x_tpu.models.base import SlotLayout
from airv2x_tpu.models.bev_backbone import BaseBEVBackbone
from airv2x_tpu.models.fusion.cobevt import SwapFusionEncoder
from airv2x_tpu.models.fusion.common import ego_agent_attention, max_fusion
from airv2x_tpu.models.fusion.v2vnet import V2VNetFusion
from airv2x_tpu.models.fusion.v2xvit import V2XTransformer
from airv2x_tpu.models.fusion.when2com import When2comFusion
from airv2x_tpu.models.fusion.where2comm import Where2commFusion
from airv2x_tpu.models.nn import DownsampleConv, NaiveCompressor
from airv2x_tpu.models.pillar_vfe import PillarVFE
from airv2x_tpu.ops.fast_pillars import FastPillarBEV
from airv2x_tpu.models.registry import register_model
from airv2x_tpu.ops.scatter import scatter_pillars_to_bev_batch
from airv2x_tpu.ops.voxelize import pillarize_batch


class PointPillarBase(nn.Module):
    """Shared spine: single-encoder pillars -> backbone -> fuse -> heads."""

    args: dict
    dtype: Any = jnp.float32

    def setup(self):
        args = self.args
        from collections.abc import Mapping

        max_cav = args.get("max_cav", 5)
        if isinstance(max_cav, Mapping):  # flax wraps dict attrs in FrozenDict
            max_cav = sum(max_cav.values())
        self.layout = SlotLayout(counts=(int(max_cav), 0, 0))
        pre = args["preprocess"]
        self.pre = pre

        # bm2cp nests the trunk config (point_pillar_bm2cp.py:215-260)
        pv = args.get("pillar_vfe") or args["pc_params"]["pillar_vfe"]
        # sort-free encoder for single-PFN-layer configs (ops/fast_pillars.py);
        # models needing per-voxel 3D features (RTNH) force the classic path
        self.fast_pillars = (
            bool(pre["args"].get("fast_pillars", True))
            and len(pv["num_filters"]) == 1
            and not getattr(self, "_force_classic_vfe", False)
        )
        if self.fast_pillars:
            self.vfe = FastPillarBEV(
                num_filters=pv["num_filters"],
                voxel_size=pre["args"]["voxel_size"],
                lidar_range=pre["cav_lidar_range"],
                use_norm=pv["use_norm"],
                with_distance=pv["with_distance"],
                use_absolute_xyz=pv["use_absolute_xyz"],
                dtype=self.dtype,
            )
        else:
            self.vfe = PillarVFE(
                num_filters=pv["num_filters"],
                voxel_size=pre["args"]["voxel_size"],
                lidar_range=pre["cav_lidar_range"],
                use_norm=pv["use_norm"],
                with_distance=pv["with_distance"],
                use_absolute_xyz=pv["use_absolute_xyz"],
                dtype=self.dtype,
            )
        bb = args.get("base_bev_backbone")
        if bb is None and "res_bev_backbone" in args:
            # coalign names its (always-ResNet) backbone differently
            # (point_pillar_coalign.py:43)
            bb = dict(args["res_bev_backbone"])
            bb["resnet"] = True
        if bb is None and "modality_fusion" in args:
            # bm2cp: modality_fusion.bev_backbone, always ResNet
            bb = dict(args["modality_fusion"]["bev_backbone"])
            bb["resnet"] = True
        if bb.get("resnet") or getattr(self, "_force_resnet_backbone", False):
            # point_pillar_baseline_multiscale.py:40-48 defaults to the
            # ResNet BEV backbone behind ``base_bev_backbone.resnet``;
            # attresnet hardcodes ResNetModified (att_resnet_bev_backbone
            # .py:189) -> subclasses force it via _force_resnet_backbone
            from airv2x_tpu.models.resnet_bev import ResNetBEVBackbone

            self.backbone = ResNetBEVBackbone(
                layer_nums=bb["layer_nums"],
                layer_strides=bb["layer_strides"],
                num_filters=bb["num_filters"],
                upsample_strides=bb["upsample_strides"],
                num_upsample_filters=bb["num_upsample_filter"],
                inplanes=int(bb.get("inplanes", pv["num_filters"][-1])),
                remat=bool(args.get("remat")),
                dtype=self.dtype,
            )
        else:
            self.backbone = BaseBEVBackbone(
                layer_nums=bb["layer_nums"],
                layer_strides=bb["layer_strides"],
                num_filters=bb["num_filters"],
                upsample_strides=bb["upsample_strides"],
                num_upsample_filters=bb["num_upsample_filter"],
                remat=bool(args.get("remat")),
                dtype=self.dtype,
            )
        shrink = args.get("shrink_header")
        if shrink is None and "modality_fusion" in args:
            shrink = args["modality_fusion"].get("shrink_header", {})
        shrink = shrink or {}
        # reference flat configs have no 'use' key — the presence of the
        # shrink_header block enables it (point_pillar_sicp.py:53-56)
        self.shrink_flag = bool(
            shrink.get("use", bool(shrink.get("dim")))
        )
        if self.shrink_flag:
            self.shrink_conv = DownsampleConv(
                dims=shrink["dim"],
                kernels=shrink["kernal_size"],
                strides=shrink["stride"],
                paddings=shrink.get("padding"),
                dtype=self.dtype,
            )
        self.compression = int(args.get("compression", 0)) > 0
        if self.compression:
            self.compressor = NaiveCompressor(
                self._compressor_width(), args["compression"], dtype=self.dtype
            )
        # binary family by default (OPV2V); ``num_class > 1`` switches to
        # the AirV2X multiclass head layout (A*C psm + objectness)
        self.num_class = int(args.get("num_class", 1))
        self.cls_head = nn.Conv(
            args["anchor_number"] * self.num_class,
            (1, 1),
            dtype=self.dtype,
            name="cls_head",
        )
        self.reg_head = nn.Conv(
            7 * args["anchor_number"], (1, 1), dtype=self.dtype, name="reg_head"
        )
        self.obj_flag = self.num_class > 1 and bool(args.get("obj_head", True))
        if self.obj_flag:
            self.obj_head = nn.Conv(
                args["anchor_number"], (1, 1), dtype=self.dtype, name="obj_head"
            )
        self.setup_fusion()

    def setup_fusion(self):
        pass

    def _compressor_width(self):
        """Channel width the NaiveCompressor restores to (reference default
        256 = post-backbone features; multiscale baseline overrides)."""
        return 256

    def encode(self, batch, train):
        pre = self.pre
        lidar_range = pre["cav_lidar_range"]
        voxel_size = pre["args"]["voxel_size"]
        grid = tuple(
            int(round((lidar_range[3 + i] - lidar_range[i]) / voxel_size[i]))
            for i in range(3)
        )
        pts = batch["points"]
        b, l = pts.shape[:2]
        flat_pts = pts.reshape((b * l,) + pts.shape[2:])
        flat_mask = batch["points_mask"].reshape((b * l,) + pts.shape[2:3])
        if self.fast_pillars:
            bev = self.vfe(flat_pts, flat_mask, train)
            bev = bev.reshape((b, l) + bev.shape[1:])
            return bev * batch["agent_mask"][:, :, None, None, None].astype(
                bev.dtype
            )
        pil = pillarize_batch(
            flat_pts,
            flat_mask,
            lidar_range=jnp.asarray(lidar_range, jnp.float32),
            voxel_size=jnp.asarray(voxel_size, jnp.float32),
            grid_size=grid,
            max_pillars=int(pre["args"].get("max_voxel_train", 16000)),
            max_points_per_pillar=int(pre["args"].get("max_points_per_voxel", 32)),
        )
        pf = self.vfe(pil.voxels, pil.num_points, pil.coords, pil.mask, train)
        bev = scatter_pillars_to_bev_batch(
            pf, pil.coords, pil.mask, ny=grid[1], nx=grid[0]
        )
        bev = bev.reshape((b, l) + bev.shape[1:])
        return bev * batch["agent_mask"][:, :, None, None, None].astype(bev.dtype)

    def fuse(self, grouped, batch, train):
        """(B, L, H, W, C) -> ((B, H, W, C), comm_rate). Default: ego only."""
        return grouped[:, 0], jnp.asarray(0.0)

    def __call__(self, batch, train: bool = False):
        x = self.encode(batch, train)
        b, l = x.shape[:2]
        flat = x.reshape((b * l,) + x.shape[2:])
        feats, _ = self.backbone(flat, train)
        if self.shrink_flag:
            feats = self.shrink_conv(feats, train)
        if self.compression:
            feats = self.compressor(feats, train)
        grouped = feats.reshape((b, l) + feats.shape[1:])
        fused, rate = self.fuse(grouped, batch, train)
        out = {
            "psm": self.cls_head(fused),
            "rm": self.reg_head(fused),
            "comm_rate": rate,
        }
        if self.obj_flag:
            out["obj"] = self.obj_head(fused)
        return out


@register_model("point_pillar")
class PointPillar(PointPillarBase):
    """Single-agent (no-fusion) baseline (models/point_pillar.py)."""


class _PerStageFusionBase(PointPillarBase):
    """Per-backbone-stage agent fusion (common_modules/att_bev_backbone.py:
    492-523 AttBEVBackbone.forward): each stage's UNFUSED features feed the
    next stage, while a param-free cross-agent fusion of that stage feeds
    its deblock; the fused pyramid is concatenated. The same structure
    serves point_pillar_baseline_multiscale.py:144-160."""

    def _stage_fusion_method(self) -> str:
        return "att"

    def _fuse_scale(self, feat, b, l, agent_mask):
        g = feat.reshape((b, l) + feat.shape[1:])
        if self._stage_fusion_method() == "att":
            return ego_agent_attention(g, agent_mask)
        return max_fusion(g, agent_mask)

    def setup_fusion(self):
        # att_bev_backbone.py:362-364,420-424: ``base_bev_backbone.
        # compression: N`` inserts an AutoEncoder bottleneck after stage idx
        # while N - idx > 0; the compressed map feeds BOTH the fusion and
        # the next stage (:493-495)
        bb = self.args["base_bev_backbone"]
        compress_layer = int(bb.get("compression", 0))
        if compress_layer > 0:
            from airv2x_tpu.models.alignnet import AutoEncoder

            self.stage_compressors = [
                AutoEncoder(f, compress_layer - i, dtype=self.dtype)
                if compress_layer - i > 0
                else None
                for i, f in enumerate(bb["num_filters"])
            ]
        else:
            self.stage_compressors = [None] * len(bb["num_filters"])

    def __call__(self, batch, train: bool = False):
        from airv2x_tpu.models.resnet_bev import ResNetBEVBackbone

        x = self.encode(batch, train)
        b, l = x.shape[:2]
        flat = x.reshape((b * l,) + x.shape[2:])
        if self.compression:
            flat = self.compressor(flat, train)

        if isinstance(self.backbone, ResNetBEVBackbone):
            ms = self.backbone.get_multiscale_feature(flat, train)
        else:
            ms, h = [], flat
            for i in range(len(self.backbone.layer_nums)):
                h = self.backbone.stage(i, h, train)
                if self.stage_compressors[i] is not None:
                    h = self.stage_compressors[i](h, train)
                ms.append(h)
        rate = sum(jnp.sum((f != 0).astype(jnp.float32)) for f in ms)
        fused_ms = [
            self._fuse_scale(f, b, l, batch["agent_mask"]) for f in ms
        ]
        if isinstance(self.backbone, ResNetBEVBackbone):
            fused = self.backbone.decode_multiscale(fused_ms, train)
        else:
            ups = [
                self.backbone.deblock(i, f, train)
                for i, f in enumerate(fused_ms)
            ]
            fused = self.backbone.finish(ups, train)
        if self.shrink_flag:
            fused = self.shrink_conv(fused, train)
        return {
            "psm": self.cls_head(fused),
            "rm": self.reg_head(fused),
            "comm_rate": rate,
        }


@register_model("point_pillar_intermediate", "point_pillar_attfusion")
class PointPillarIntermediate(_PerStageFusionBase):
    """AttFusion intermediate baseline (models/point_pillar_intermediate.py
    :34 builds AttBEVBackbone: per-stage param-free scaled-dot attention
    across agents, self_attn.py:46-61)."""

    def _compressor_width(self):
        # AttBEVBackbone's optional compression sits on the scatter canvas
        return int(self.args["pillar_vfe"]["num_filters"][-1])


@register_model("point_pillar_max", "point_pillar_fcooper")
class PointPillarMax(PointPillarBase):
    """Twin of models/point_pillar_max.py: post-backbone ego-warp + max
    (max_modules/max_fuse.MaxFusion:31-112 — each agent's feature map is
    warped to the ego frame with the normalized affine, then elementwise
    max over present agents). ``point_pillar_fcooper`` is registered here
    too: the reference ships opv2v_fcooper.yaml but no model file (F-Cooper
    IS max fusion; the upstream config cannot run, documented quirk).

    Without a ``v2vfusion`` block (or with identity poses / proj_first
    datasets) this reduces to the plain masked max of
    fuse_modules/fusion_in_one.MaxFusion:90."""

    def setup_fusion(self):
        v2v = self.args.get("v2vfusion") or {}
        vs = v2v.get("voxel_size") or self.pre["args"]["voxel_size"]
        self._discrete_ratio = float(vs[0])
        self._downsample_rate = float(v2v.get("downsample_rate", 1))
        self._warp_fuse = "v2vfusion" in self.args

    def fuse(self, grouped, batch, train):
        if self._warp_fuse and "pairwise_t_full" in batch:
            from airv2x_tpu.ops.warp import (
                normalized_pairwise_affine,
                warp_affine_normalized,
            )

            aff = normalized_pairwise_affine(
                batch["pairwise_t_full"], grouped.shape[2], grouped.shape[3],
                self._discrete_ratio, self._downsample_rate,
            )[:, 0]
            warped = warp_affine_normalized(grouped[:, 1:], aff[:, 1:])
            grouped = jnp.concatenate([grouped[:, :1], warped], axis=1)
        return max_fusion(grouped, batch["agent_mask"]), jnp.asarray(1.0)


@register_model("point_pillar_where2comm")
class PointPillarWhere2comm(PointPillarBase):
    def setup_fusion(self):
        w2c = self.args["where2comm_fusion"]
        comm = w2c.get("communication", {})
        gauss = comm.get("gaussian_smooth")
        self.fusion_net = Where2commFusion(
            multi_scale=False,
            fully=w2c.get("fully", False),
            threshold=comm.get("threshold", 0.01),
            smooth=gauss is not None,
            k_size=gauss["k_size"] if gauss else 5,
            c_sigma=gauss["c_sigma"] if gauss else 1.0,
            dtype=self.dtype,
        )

    def fuse(self, grouped, batch, train):
        b, l = grouped.shape[:2]
        flat = grouped.reshape((b * l,) + grouped.shape[2:])
        psm_single = self.cls_head(flat)
        psm_grouped = psm_single.reshape((b, l) + psm_single.shape[1:])
        return self.fusion_net(
            grouped, psm_grouped, batch["agent_mask"], train=train
        )


@register_model("point_pillar_v2xvit")
class PointPillarV2XViT(PointPillarBase):
    def setup_fusion(self):
        self.fusion_net = V2XTransformer(self.args["transformer"], dtype=self.dtype)

    def fuse(self, grouped, batch, train):
        fused = self.fusion_net(
            grouped,
            batch["agent_mask"],
            batch["pairwise_t"],
            batch["prior_encoding"],
            train,
        )
        return fused, jnp.asarray(1.0)


@register_model("point_pillar_cobevt")
class PointPillarCoBEVT(PointPillarBase):
    def setup_fusion(self):
        fax = dict(self.args["fax_fusion"])
        fax.setdefault("agent_size", self.layout.total)
        self.fusion_net = SwapFusionEncoder(args=fax, dtype=self.dtype)

    def fuse(self, grouped, batch, train):
        return self.fusion_net(grouped, batch["agent_mask"], train), jnp.asarray(1.0)


@register_model("point_pillar_v2vnet")
class PointPillarV2VNet(PointPillarBase):
    def setup_fusion(self):
        self.fusion_net = V2VNetFusion(args=self.args["v2vfusion"], dtype=self.dtype)

    def fuse(self, grouped, batch, train):
        fused = self.fusion_net(
            grouped, batch["agent_mask"], batch["pairwise_t_full"], train
        )
        return fused, jnp.asarray(1.0)


@register_model("point_pillar_when2com")
class PointPillarWhen2com(PointPillarBase):
    def setup_fusion(self):
        self.fusion_net = When2comFusion(
            args=self.args["when2com_fusion"], dtype=self.dtype
        )

    def fuse(self, grouped, batch, train):
        fused = self.fusion_net(
            grouped, batch["agent_mask"], batch["pairwise_t_full"], train
        )
        return fused, jnp.asarray(1.0)


class PixelWeightLayer(nn.Module):
    """point_pillar_disconet.py:176-199: cat(neighbor, ego) -> 1x1 conv
    stack 2C->128->32->8->1 (BN+ReLU between, final ReLU, no final BN)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from airv2x_tpu.models.nn import BN_EPS, BN_MOMENTUM

        def bn(y):
            return nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM,
                epsilon=BN_EPS, dtype=self.dtype,
            )(y)

        x = nn.relu(bn(nn.Conv(128, (1, 1), dtype=self.dtype)(x)))
        x = nn.relu(bn(nn.Conv(32, (1, 1), dtype=self.dtype)(x)))
        x = nn.relu(bn(nn.Conv(8, (1, 1), dtype=self.dtype)(x)))
        return nn.relu(nn.Conv(1, (1, 1), dtype=self.dtype)(x))


@register_model("point_pillar_disconet")
class PointPillarDiscoNet(PointPillarBase):
    """DiscoNet student (models/point_pillar_disconet.py): pixel-weighted
    agent fusion via the faithful PixelWeightLayer on cat(neighbor, ego);
    the frozen teacher (early-fusion point_pillar) supervises features via
    loss.variants.make_disconet_loss."""

    def setup_fusion(self):
        self.weight_net = PixelWeightLayer(dtype=self.dtype, name="pixel_weight")

    def fuse(self, grouped, batch, train):
        b, l = grouped.shape[:2]
        ego_rep = jnp.broadcast_to(grouped[:, :1], grouped.shape)
        cat = jnp.concatenate([grouped, ego_rep], axis=-1)
        flat = cat.reshape((b * l,) + cat.shape[2:])
        logits = self.weight_net(flat, train).reshape(
            b, l, *grouped.shape[2:4], 1
        )
        mask = batch["agent_mask"][:, :, None, None, None]
        logits = jnp.where(mask, logits, -1e9)
        w = jnp.exp(logits - jnp.max(logits, axis=1, keepdims=True))
        w = w * mask.astype(w.dtype)
        w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-9)
        return jnp.sum(grouped * w, axis=1), jnp.asarray(1.0)

    def __call__(self, batch, train: bool = False):
        x = self.encode(batch, train)
        b, l = x.shape[:2]
        flat = x.reshape((b * l,) + x.shape[2:])
        feats, _ = self.backbone(flat, train)
        if self.shrink_flag:
            feats = self.shrink_conv(feats, train)
        if self.compression:
            feats = self.compressor(feats, train)
        grouped = feats.reshape((b, l) + feats.shape[1:])
        fused, rate = self.fuse(grouped, batch, train)
        return {
            "psm": self.cls_head(fused),
            "rm": self.reg_head(fused),
            "comm_rate": rate,
            # fused BEV map for KD feature imitation against the frozen
            # early-fusion teacher (loss/point_pillar_disconet_loss.py)
            "student_feature": fused,
        }


@register_model("point_pillar_sicp")
class PointPillarSiCP(PointPillarBase):
    """Flat SiCP (models/point_pillar_sicp.py:29-158): trunk -> SpatialFusion
    pairwise gated fusion; training emits both the ego-solo (psm1/rm1) and
    cooperative (psm2/rm2) head outputs for the SiCP dual loss, eval emits
    the fused heads."""

    def setup_fusion(self):
        from airv2x_tpu.models.fusion.sicp import SpatialFusion

        # reference configs put in_channels/out_channels at args TOP level
        # with in_channels pre-doubled (V2X-R/LiDAR/V2XR_sicp.yaml: 512 =
        # 2 x 256); a nested ``fusion`` dict is accepted too
        fcfg = self.args.get("fusion") or {
            k: self.args[k]
            for k in ("in_channels", "out_channels", "voxel_size",
                      "downsample_rate")
            if k in self.args
        }
        self.fusion_net = SpatialFusion(
            in_channels=int(fcfg["in_channels"]),
            out_channels=int(fcfg["out_channels"]),
            dtype=self.dtype,
        )
        self._sicp_cfg = dict(fcfg)

    def fuse(self, grouped, batch, train):
        vs = self._sicp_cfg.get("voxel_size") or self.pre["args"]["voxel_size"]
        fused = self.fusion_net(
            grouped,
            batch["agent_mask"],
            batch["pairwise_t_full"],
            discrete_ratio=vs[0],
            downsample_rate=self._sicp_cfg.get("downsample_rate", 2),
            train=train,
        )
        return fused, jnp.asarray(1.0)

    def __call__(self, batch, train: bool = False):
        x = self.encode(batch, train)
        b, l = x.shape[:2]
        flat = x.reshape((b * l,) + x.shape[2:])
        feats, _ = self.backbone(flat, train)
        if self.shrink_flag:
            feats = self.shrink_conv(feats, train)
        if self.compression:
            feats = self.compressor(feats, train)
        grouped = feats.reshape((b, l) + feats.shape[1:])
        fused, rate = self.fuse(grouped, batch, train)
        out = {
            "psm": self.cls_head(fused),
            "rm": self.reg_head(fused),
            "comm_rate": rate,
        }
        if train:
            # dual-loss branch (point_pillar_sicp.py:135-144): solo ego
            # and cooperative predictions through the SHARED heads
            ego = grouped[:, 0]
            out["psm1"], out["rm1"] = self.cls_head(ego), self.reg_head(ego)
            out["psm2"], out["rm2"] = out["psm"], out["rm"]
        return out


@register_model("point_pillar_baseline_multiscale")
class PointPillarBaselineMultiscale(_PerStageFusionBase):
    """Multiscale single-fusion baseline
    (models/point_pillar_baseline_multiscale.py:26-170): per-backbone-scale
    max or attention fusion across agents, fused pyramid decoded through the
    deblocks; ``base_bev_backbone.resnet`` (default true upstream) selects
    the ResNet BEV backbone. Comm rate is the summed nonzero count of the
    shared per-scale features (reference :146-149)."""

    def _stage_fusion_method(self) -> str:
        return self.args.get("fusion_method", "max")

    def _compressor_width(self):
        # reference compresses the 64ch scatter canvas BEFORE the backbone
        # (:140-141, NaiveCompressor(64, ...))
        return int(self.args["pillar_vfe"]["num_filters"][-1])
