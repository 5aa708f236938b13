"""Flat BM2CP (flax twin of models/point_pillar_bm2cp.py): multimodal
pillar + camera perception with occupancy-routed voxel fusion and
threshold-map attention communication (OPV2V / DAIR bm2cp configs).

Forward (:300-445): pillar encode keeps the 3D voxel volume; the camera
branch lifts EfficientNet features with observed-depth one-hot blending
(sensor_blocks.ImgCamEncode) and voxel-pools them WITHOUT collapsing Z;
MultiModalFusion routes pc/img voxels by occupancy masks into a fused BEV
(+ the threshold map); the backbone + AttenComm collaborative stage fuses
agents per level with confidence-vs-threshold communication masks; 1x1
heads (+ optional supervise_single per-slot outputs).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from airv2x_tpu.models.camera.lss import (
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
from airv2x_tpu.models.point_pillar_models import PointPillarBase
from airv2x_tpu.models.registry import register_model
from airv2x_tpu.ops.warp import (
    normalized_pairwise_affine,
    warp_affine_normalized,
)


def bm2cp_voxel_pooling(geom, feats, dx, bx, nx):
    """point_pillar_bm2cp.voxel_pooling (:492-560): scatter-add into the
    3D voxel grid, Z KEPT (B, Z, Y, X, C)."""
    b = geom.shape[0]
    c = feats.shape[-1]
    nx_x, nx_y, nx_z = int(nx[0]), int(nx[1]), int(nx[2])
    idx = ((geom - (bx - dx / 2.0)) / dx).astype(jnp.int32)
    ix, iy, iz = idx[..., 0], idx[..., 1], idx[..., 2]
    valid = (
        (ix >= 0) & (ix < nx_x) & (iy >= 0) & (iy < nx_y) & (iz >= 0)
        & (iz < nx_z)
    )
    flat = jnp.where(valid, (iz * nx_y + iy) * nx_x + ix, nx_x * nx_y * nx_z)
    flat = flat.reshape(b, -1)
    f = feats.reshape(b, -1, c)

    def one(fl, ft):
        canvas = jnp.zeros((nx_x * nx_y * nx_z, c), ft.dtype)
        return canvas.at[fl].add(ft, mode="drop")

    out = jax.vmap(one)(flat, f)
    return out.reshape(b, nx_z, nx_y, nx_x, c)


@register_model("point_pillar_bm2cp")
class PointPillarBM2CP(PointPillarBase):
    def setup_fusion(self):
        args = self.args
        img = dict(args["img_params"])
        self._img = img
        cf = dict(args["collaborative_fusion"])
        self._cf = cf
        self._discrete_ratio = float(cf["voxel_size"][0])
        self._downsample_rate = float(cf.get("downsample_rate", 1))
        self._supervise_single = bool(args.get("supervise_single", False))
        d = len(
            create_frustum(
                img["data_aug_conf"]["final_dim"],
                img["img_downsample"],
                img["grid_conf"]["ddiscr"],
                img["grid_conf"]["mode"],
            )
        )
        self.camencode = ImgCamEncode(
            depth_bins=d,
            context_c=int(img["bev_dim"]),
            downsample=int(img["img_downsample"]),
            dtype=self.dtype,
            name="camencode",
        )
        self.modal_fusion = MultiModalFusion(
            dim=int(img["bev_dim"]), dtype=self.dtype, name="fusion"
        )

    def _compressor_width(self):
        return 256

    def __call__(self, batch, train: bool = False):
        img = self._img
        grid = img["grid_conf"]
        dx, bx, nx = gen_dx_bx(grid["xbound"], grid["ybound"], grid["zbound"])
        frustum = jnp.asarray(
            create_frustum(
                img["data_aug_conf"]["final_dim"],
                img["img_downsample"],
                grid["ddiscr"],
                grid["mode"],
            )
        )

        spatial = self.encode(batch, train)  # (B, L, Y, X, C) collapsed pc
        b, l = spatial.shape[:2]
        agent_mask = batch["agent_mask"]

        # pillar 3D volume: the shared encoder collapses Z on the channel
        # axis; with nz == 1 (the bm2cp pillar grid) the volume is just the
        # BEV map with a unit Z axis — matching spatial_features_3d
        pc_voxel = spatial.reshape((b * l, 1) + spatial.shape[2:])

        cam = batch["cam_vehicle"]
        imgs = cam["imgs"]  # (B, L, Ncam, H, W, 3[+1])
        ncam = imgs.shape[2]
        flat_imgs = imgs.reshape((b * l * ncam,) + imgs.shape[3:])
        depth_maps = cam["depth_maps"]  # (B, L, [2,] Ncam, H, W), bin units
        if depth_maps.ndim == 6:  # (B, L, 2, Ncam, H, W)
            per_cam = []
            for cidx in range(ncam):
                per_cam.append(
                    fuse_ego_depth(depth_maps[:, :, :, cidx], agent_mask)
                )
            depth = jnp.stack(per_cam, axis=2)  # (B, L, Ncam, H, W)
        else:
            depth = depth_maps
        flat_depth = depth.reshape((b * l * ncam,) + depth.shape[3:])

        lifted = self.camencode(
            flat_imgs[..., :3].astype(self.dtype), flat_depth, train
        )  # (B*L*Ncam, fH, fW, D, C)
        lifted = lifted.reshape((b * l, ncam) + lifted.shape[1:])
        lifted = jnp.moveaxis(lifted, 4, 2)  # (B*L, Ncam, D, fH, fW, C)

        geom = get_geometry(
            frustum,
            cam["rots"].reshape((b * l, ncam, 3, 3)).astype(jnp.float32),
            cam["trans"].reshape((b * l, ncam, 3)).astype(jnp.float32),
            cam["intrinsics"].reshape((b * l, ncam, 3, 3)).astype(jnp.float32),
            cam["post_rots"].reshape((b * l, ncam, 3, 3)).astype(jnp.float32),
            cam["post_trans"].reshape((b * l, ncam, 3)).astype(jnp.float32),
        )
        img_voxel = bm2cp_voxel_pooling(
            geom, lifted, jnp.asarray(dx), jnp.asarray(bx), nx
        )  # (B*L, Z, Y, X, C)

        fused_2d, thres_map, mask_map = self.modal_fusion(img_voxel, pc_voxel)

        # backbone + single-agent heads
        feats_2d, _ = self.backbone(fused_2d, train)
        if self.shrink_flag:
            feats_2d = self.shrink_conv(feats_2d, train)
        if self.compression:
            feats_2d = self.compressor(feats_2d, train)
        psm_single = self.cls_head(feats_2d)

        # AttenComm collaborative stage (attentioncomm.py:106-260)
        aff = normalized_pairwise_affine(
            batch["pairwise_t_full"],
            fused_2d.shape[1], fused_2d.shape[2],
            self._discrete_ratio, self._downsample_rate,
        )[:, 0]
        mask5 = agent_mask[:, :, None, None, None].astype(fused_2d.dtype)

        def warp_slots(v):
            warped = warp_affine_normalized(v[:, 1:], aff[:, 1:])
            return jnp.concatenate([v[:, :1], warped], axis=1)

        psm_slots = psm_single.reshape((b, l) + psm_single.shape[1:])
        conf = jnp.max(jax.nn.sigmoid(psm_slots), axis=-1, keepdims=True)
        thres_slots = thres_map.reshape((b, l) + thres_map.shape[1:])
        # resize the threshold map to the confidence resolution (bilinear)
        if conf.shape[2:4] != thres_slots.shape[2:4]:
            th, tw = conf.shape[2], conf.shape[3]
            flat_t = thres_slots.reshape((b * l,) + thres_slots.shape[2:])
            flat_t = jax.image.resize(
                flat_t, (b * l, th, tw, 1), "bilinear"
            )
            thres_slots = flat_t.reshape((b, l, th, tw, 1))
        comm_mask = (conf > thres_slots).astype(fused_2d.dtype)
        even = (jnp.arange(l) % 2 == 0)[None, :, None, None, None]
        comm_mask = jnp.where(even, jnp.ones_like(comm_mask), comm_mask)
        hw = comm_mask.shape[2] * comm_mask.shape[3]
        comm_rate = jnp.mean(jnp.sum(comm_mask[:, 0], axis=(1, 2, 3)) / hw)

        fused_slots = fused_2d.reshape((b, l) + fused_2d.shape[1:])
        if bool(self._cf.get("multi_scale", True)):
            flat_fused = fused_2d
            feats = (
                self.backbone.get_multiscale_feature(flat_fused, train)
                if hasattr(self.backbone, "get_multiscale_feature")
                else None
            )
            if feats is None:
                feats, y = [], flat_fused
                for i in range(len(self.backbone.stages)):
                    y = self.backbone.stages[i](y, train)
                    feats.append(y)
            ups = []
            for i in range(len(feats)):
                xi = feats[i].reshape((b, l) + feats[i].shape[1:])
                if i == 0:
                    cm = comm_mask
                    if cm.shape[2:4] != xi.shape[2:4]:
                        cm = jax.image.resize(
                            cm.reshape((b * l,) + cm.shape[2:]),
                            (b * l, xi.shape[2], xi.shape[3], 1),
                            "bilinear",
                        ).reshape((b, l, xi.shape[2], xi.shape[3], 1))
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
            f2d = feats_2d.reshape((b, l) + feats_2d.shape[1:])
            f2d = f2d * comm_mask
            fused = atten_fusion(warp_slots(f2d) * mask5, agent_mask)

        out = {
            "psm": self.cls_head(fused),
            "rm": self.reg_head(fused),
            "comm_rate": comm_rate,
            "mask": mask_map,
        }
        if self._supervise_single:
            rm_single = self.reg_head(feats_2d)
            rm_slots = rm_single.reshape((b, l) + rm_single.shape[1:])
            out.update(
                {
                    "psm_single_v": psm_slots[:, 0],
                    "rm_single_v": rm_slots[:, 0],
                }
            )
            if l > 1:
                out["psm_single_i"] = psm_slots[:, 1]
                out["rm_single_i"] = rm_slots[:, 1]
        return out
