"""Airv2x BM2CP — faithful flax twin of models/airv2x_bm2cp.py +
bm2cp_modules/{sensor_blocks,attentioncomm,base_bev_backbone_resnet}.py.

Per-agent-type encoders mirror the reference parameter tree so checkpoints
convert weight-for-weight:

  * ``veh_model`` / ``rsu_model`` — sensor_blocks.LidarCamBM2CPEncoder
    (:493-560): PillarVFE pillar volume (Z kept), ImgCamEncode camera lift
    (EfficientNet-b0 trunk + Up fusion + observed-depth one-hot blending,
    :68-212), voxel pooling WITHOUT collapsing Z (:538-592), and the
    occupancy-routed MultiModalFusion (:242-310) producing the fused BEV +
    per-pixel communication-threshold map;
  * ``drone_model`` — sensor_blocks.LiftSplatShootEncoder (:595-881): LSS
    CamEncode + BevEncode, then MultiModalFusion against the reference's
    all-zero ``mock_lidar_for_drone`` volume (utils/airv2x_utils.py:537)
    so every drone pixel is camera-routed and its threshold map is 0.5;
  * ``backbone`` — bm2cp_modules ResNetBEVBackbone (= the shared resblock
    backbone, models/resnet_bev.py twin);
  * ``fusion_net`` — AttenComm (attentioncomm.py:106-260): parameter-less.
    Level-0 communication masks are confidence-vs-threshold-map with the
    even-agent-index always-send quirk (:96-99) preserved on static slots;
    per-level pixel-wise agent self-attention (AttenFusion, ego row kept)
    re-runs ``backbone.resnet`` on the pre-backbone fused features
    (airv2x_bm2cp.py:181-196).

Static-slot note: the reference's even-index quirk applies to the
concatenated list of *present* agents; with dense slots it is applied to
even slot indices, identical whenever slots are filled front-to-back.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from airv2x_tpu.models.base import AGENT_TYPES, SlotLayout
from airv2x_tpu.models.camera.lss import (
    LSSCameraEncoder,
    create_frustum,
    gen_dx_bx,
    get_geometry,
)
from airv2x_tpu.models.fusion.bm2cp_flat import (
    ImgCamEncode,
    MultiModalFusion,
    fuse_ego_depth,
)
from airv2x_tpu.models.fusion.scope import atten_fusion
from airv2x_tpu.models.heads import BevSegHead, DetectionHeads
from airv2x_tpu.models.nn import DownsampleConv, NaiveCompressor
from airv2x_tpu.models.pillar_vfe import PillarVFE
from airv2x_tpu.models.registry import register_model
from airv2x_tpu.models.resnet_bev import ResNetBEVBackbone
from airv2x_tpu.ops.scatter import scatter_pillars_to_bev_batch
from airv2x_tpu.ops.voxelize import pillarize_batch
from airv2x_tpu.ops.warp import (
    normalized_pairwise_affine,
    warp_affine_normalized,
)


def _bilinear(x, h, w):
    """torch F.interpolate(mode='bilinear', align_corners=False) analog."""
    return jax.image.resize(x, x.shape[:-3] + (h, w) + x.shape[-1:],
                            "bilinear")


class BM2CPAgentEncoder(nn.Module):
    """sensor_blocks.LidarCamBM2CPEncoder (:493-560) for one agent type."""

    img_params: dict
    pc_params: dict
    preprocess: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pts, pts_mask, cam, depth_maps, train: bool = False):
        """pts (N, P, 4) ego-frame; cam dict with imgs (N, Ncam, H, W, 3+),
        depth_maps (N, Ncam, H, W) in BIN units (-1 = unobserved).
        Returns (fused_2d (N, Y, X, C*Z), thres (N, Y, X, 1),
        mask (N, Y, X, 1))."""
        pre = self.preprocess
        lidar_range = pre["cav_lidar_range"]
        voxel_size = pre["args"]["voxel_size"]
        grid = tuple(
            int(round((lidar_range[3 + i] - lidar_range[i]) / voxel_size[i]))
            for i in range(3)
        )
        nx_l, ny_l = grid[0], grid[1]

        # lidar branch: shared-ego-grid pillarization + per-type PillarVFE
        # constants (pc_params), as in the reference dataset/encoder split
        pil = pillarize_batch(
            pts,
            pts_mask,
            lidar_range=jnp.asarray(lidar_range, jnp.float32),
            voxel_size=jnp.asarray(voxel_size, jnp.float32),
            grid_size=grid,
            max_pillars=int(pre["args"].get("max_voxel_train", 16000)),
            max_points_per_pillar=int(
                pre["args"].get("max_points_per_voxel", 32)
            ),
        )
        pc = self.pc_params
        pf = PillarVFE(
            num_filters=pc["pillar_vfe"]["num_filters"],
            voxel_size=pc["voxel_size"],
            lidar_range=pc["lidar_range"],
            use_norm=pc["pillar_vfe"]["use_norm"],
            with_distance=pc["pillar_vfe"]["with_distance"],
            use_absolute_xyz=pc["pillar_vfe"]["use_absolute_xyz"],
            dtype=self.dtype,
            name="vfe",
        )(pil.voxels, pil.num_points, pil.coords, pil.mask, train)
        bev = scatter_pillars_to_bev_batch(
            pf, pil.coords, pil.mask, ny=ny_l, nx=nx_l
        )  # (N, Y, X, C)
        pc_voxel = bev[:, None]  # spatial_features_3d, Z = 1

        # camera branch (ImgCamEncode + voxel pooling, Z KEPT :538-592)
        img = self.img_params
        grid_conf = img["grid_conf"]
        dx, bx, nx = gen_dx_bx(
            grid_conf["xbound"], grid_conf["ybound"], grid_conf["zbound"]
        )
        frustum = jnp.asarray(
            create_frustum(
                img["data_aug_conf"]["final_dim"],
                img["img_downsample"],
                grid_conf["ddiscr"],
                grid_conf["mode"],
            )
        )
        imgs = cam["imgs"]
        n, ncam = imgs.shape[:2]
        flat_imgs = imgs.reshape((n * ncam,) + imgs.shape[2:])
        flat_depth = depth_maps.reshape((n * ncam,) + depth_maps.shape[2:])
        lifted = ImgCamEncode(
            depth_bins=int(frustum.shape[0]),
            context_c=int(img["bev_dim"]),
            downsample=int(img["img_downsample"]),
            dtype=self.dtype,
            name="camencode",
        )(flat_imgs[..., :3].astype(self.dtype), flat_depth, train)
        lifted = lifted.reshape((n, ncam) + lifted.shape[1:])
        lifted = jnp.moveaxis(lifted, 4, 2)  # (N, Ncam, D, fH, fW, C)
        geom = get_geometry(
            frustum,
            cam["rots"].astype(jnp.float32),
            cam["trans"].astype(jnp.float32),
            cam["intrinsics"].astype(jnp.float32),
            cam["post_rots"].astype(jnp.float32),
            cam["post_trans"].astype(jnp.float32),
        )
        from airv2x_tpu.models.point_pillar_bm2cp_model import (
            bm2cp_voxel_pooling,
        )

        img_voxel = bm2cp_voxel_pooling(
            geom, lifted, jnp.asarray(dx), jnp.asarray(bx), nx
        )  # (N, Z, Y, X, C)

        return MultiModalFusion(
            dim=int(img["bev_dim"]), dtype=self.dtype, name="intra_fusion"
        )(img_voxel, pc_voxel)


class BM2CPDroneEncoder(nn.Module):
    """sensor_blocks.LiftSplatShootEncoder (:595-881): camera-only LSS +
    BevEncode, modal-fused against the all-zero drone mock lidar."""

    cfg: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cam, train: bool = False):
        bev = LSSCameraEncoder(cfg=self.cfg, dtype=self.dtype, name="lss")(
            cam, train
        )  # (N, Y, X, bevout)
        x_3d = bev[:, None]  # (N, 1, Y, X, C)
        mock = jnp.zeros_like(x_3d)  # mock_lidar_for_drone: zero volume
        return MultiModalFusion(
            dim=int(self.cfg["bev_dim"]), dtype=self.dtype,
            name="intra_fusion",
        )(x_3d, mock[..., : x_3d.shape[-1]])


@register_model("airv2x_bm2cp")
class Airv2xBM2CP(nn.Module):
    """airv2x_bm2cp.py Airv2xBM2CP (:37-271)."""

    args: dict
    dtype: Any = jnp.float32

    def setup(self):
        args = self.args
        self.layout = SlotLayout.from_args(args)
        self.collaborators = list(args["collaborators"])
        self._pre = args["preprocess"]

        if "vehicle" in self.collaborators and self.layout.counts[0]:
            self.veh_model = BM2CPAgentEncoder(
                img_params=args["vehicle"]["img_params"],
                pc_params=args["vehicle"]["pc_params"],
                preprocess=self._pre,
                dtype=self.dtype,
            )
        if "rsu" in self.collaborators and self.layout.counts[1]:
            self.rsu_model = BM2CPAgentEncoder(
                img_params=args["rsu"]["img_params"],
                pc_params=args["rsu"]["pc_params"],
                preprocess=self._pre,
                dtype=self.dtype,
            )
        if "drone" in self.collaborators and self.layout.counts[2]:
            self.drone_model = BM2CPDroneEncoder(
                cfg=args["drone"], dtype=self.dtype
            )

        mod = args["modality_fusion"]
        bb = mod["bev_backbone"]
        self.backbone = ResNetBEVBackbone(
            layer_nums=bb["layer_nums"],
            layer_strides=bb["layer_strides"],
            num_filters=bb["num_filters"],
            upsample_strides=bb.get("upsample_strides", ()),
            num_upsample_filters=bb.get("num_upsample_filter", ()),
            inplanes=int(
                args["vehicle"]["pc_params"]["point_pillar_scatter"][
                    "num_features"
                ]
            ),
            dtype=self.dtype,
        )
        shrink = mod.get("shrink_header", {})
        self.shrink_flag = bool(shrink.get("use"))
        if self.shrink_flag:
            self.shrink_conv = DownsampleConv(
                dims=shrink["dim"],
                kernels=shrink["kernal_size"],
                strides=shrink["stride"],
                paddings=shrink.get("padding"),
                dtype=self.dtype,
            )
        self.compression = int(mod.get("compression", 0)) > 0
        if self.compression:
            self.compressor = NaiveCompressor(
                256, mod["compression"], dtype=self.dtype
            )

        cf = args["collaborative_fusion"]
        self._cf = cf
        self.multi_scale = bool(cf.get("multi_scale", True))

        self.task = args.get("task", "det")
        if self.task == "det":
            self.heads = DetectionHeads(
                anchor_number=args["anchor_number"],
                num_class=args["num_class"],
                obj_head=bool(args.get("obj_head", True)),
                dtype=self.dtype,
            )
        else:
            self.seg_head = BevSegHead(
                seg_branch=args["seg_branch"],
                seg_hw=args["seg_hw"],
                dynamic_class=args["dynamic_class"],
                static_class=args["static_class"],
                seg_res=args["seg_res"],
                cav_range=args["cav_range"],
                dtype=self.dtype,
            )

    def _encode_agents(self, batch, train):
        """Per-type encoders -> fused slots (B, L, Y, X, C), thres/mask
        slots (B, L, Y, X, 1) (extract_features + repack, bk base :28-140;
        static slots replace batch_idxs/record_len regrouping)."""
        pts = batch["points"]
        b = pts.shape[0]
        feats, thres, masks = [], [], []
        for t in AGENT_TYPES:
            sl = self.layout.slots(t)
            n_t = sl.stop - sl.start
            if n_t == 0:
                continue

            def flat(a, sl=sl, n_t=n_t):
                s = a[:, sl]
                return s.reshape((b * n_t,) + s.shape[2:])

            cam = {k: flat(v) for k, v in batch[f"cam_{t}"].items()}
            if t == "drone":
                f2d, th, mk = self.drone_model(cam, train)
            else:
                depth = batch[f"cam_{t}"]["depth_maps"]
                if depth.ndim == 6:  # (B, L, 2, Ncam, H, W) ego-composite
                    ncam = depth.shape[3]
                    per_cam = [
                        fuse_ego_depth(depth[:, :, :, c], batch["agent_mask"])
                        for c in range(ncam)
                    ]
                    depth = jnp.stack(per_cam, axis=2)
                model = self.veh_model if t == "vehicle" else self.rsu_model
                f2d, th, mk = model(
                    flat(pts), flat(batch["points_mask"]), cam, flat(depth),
                    train,
                )
            feats.append(f2d.reshape((b, n_t) + f2d.shape[1:]))
            thres.append(th.reshape((b, n_t) + th.shape[1:]))
            masks.append(mk.reshape((b, n_t) + mk.shape[1:]))
        am = batch["agent_mask"][:, :, None, None, None]
        x = jnp.concatenate(feats, axis=1) * am.astype(feats[0].dtype)
        return x, jnp.concatenate(thres, axis=1), jnp.concatenate(masks, 1)

    def __call__(self, batch, train: bool = False):
        x, thres_slots, mask_slots = self._encode_agents(batch, train)
        b, l = x.shape[:2]
        agent_mask = batch["agent_mask"]
        flat_x = x.reshape((b * l,) + x.shape[2:])

        # encode + shrink/compress before sharing (airv2x_bm2cp.py:165-173)
        f2d, _ = self.backbone(flat_x, train)
        if self.shrink_flag:
            f2d = self.shrink_conv(f2d, train)
        if self.compression:
            f2d = self.compressor(f2d, train)

        if self.task == "det":
            conf = self.heads(f2d)["psm"]
        else:
            _, conf = self.seg_head(f2d, return_features=True)
        conf_slots = conf.reshape((b, l) + conf.shape[1:])

        # AttenComm (attentioncomm.py:136-260)
        cf = self._cf
        aff = normalized_pairwise_affine(
            batch["pairwise_t_full"], x.shape[2], x.shape[3],
            float(cf["voxel_size"][0]), float(cf.get("downsample_rate", 1)),
        )[:, 0]

        def warp_slots(v):
            warped = warp_affine_normalized(v[:, 1:], aff[:, 1:])
            return jnp.concatenate([v[:, :1], warped], axis=1)

        # communication (:68-104): sigmoid confidence max vs threshold map
        th = thres_slots
        if th.shape[2:4] != conf_slots.shape[2:4]:
            th = _bilinear(th, conf_slots.shape[2], conf_slots.shape[3])
        maps = jnp.max(
            jax.nn.sigmoid(conf_slots.astype(jnp.float32)), axis=-1,
            keepdims=True,
        )
        comm_mask = (maps > th).astype(x.dtype)
        even = (jnp.arange(l) % 2 == 0)[None, :, None, None, None]
        comm_mask = jnp.where(even, jnp.ones_like(comm_mask), comm_mask)
        hw = comm_mask.shape[2] * comm_mask.shape[3]
        comm_rate = jnp.mean(jnp.sum(comm_mask[:, 0], axis=(1, 2, 3)) / hw)
        mask5 = agent_mask[:, :, None, None, None].astype(x.dtype)

        if self.multi_scale:
            feats = self.backbone.get_multiscale_feature(flat_x, train)
            ups = []
            for i, f in enumerate(feats):
                xi = f.reshape((b, l) + f.shape[1:])
                if i == 0:
                    cm = comm_mask
                    if cm.shape[2:4] != xi.shape[2:4]:
                        cm = _bilinear(cm, xi.shape[2], xi.shape[3])
                    xi = xi * cm
                xi = warp_slots(xi) * mask5
                ups.append(
                    self.backbone.deblocks[i](
                        atten_fusion(xi, agent_mask), train
                    )
                )
            fused = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
            if self.shrink_flag:
                fused = self.shrink_conv(fused, train)
        else:
            f_slots = f2d.reshape((b, l) + f2d.shape[1:])
            cm = comm_mask
            if cm.shape[2:4] != f_slots.shape[2:4]:
                cm = _bilinear(cm, f_slots.shape[2], f_slots.shape[3])
            fused = atten_fusion(warp_slots(f_slots * cm) * mask5, agent_mask)

        if self.task == "det":
            out = dict(self.heads(fused))
        else:
            out = dict(self.seg_head(fused))
        out["comm_rate"] = comm_rate
        out["mask"] = mask_slots
        return out
