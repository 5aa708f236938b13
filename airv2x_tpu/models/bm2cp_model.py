"""Airv2x BM2CP: multimodal (LiDAR+camera) per-agent encoding with
confidence-guided collaboration.

Behavioural twin of models/airv2x_bm2cp.py + bm2cp_modules/: per agent, the
lidar and camera BEV maps interact through the sensor_blocks.py
MultiModalFusion logic (:241-315, BEV analog of its collapsed-Z output):

  * occupancy masks per modality (any non-zero channel);
  * where both modalities exist: a gated fuse
    ``multifuse([relu(multigate(pc)) * img, pc])``;
  * lidar-only pixels keep lidar; camera-only pixels keep the camera
    features gated by the ImgModalFusion channel-attention mask (:214-239);
  * ``thres_map`` = 0 where both modalities agree, 0.5 elsewhere — a
    per-pixel communication threshold consumed by the where2comm-style
    Communication (bm2cp_modules/attentioncomm.py).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from airv2x_tpu.models.fusion.common import ego_agent_attention
from airv2x_tpu.models.fusion.where2comm import Communication
from airv2x_tpu.models.intermediate_models import PostBackboneFusionModel
from airv2x_tpu.models.registry import register_model


class ImgModalFusion(nn.Module):
    """sensor_blocks.py ImgModalFusion (:214-239): camera features are
    gated by a channel-attention mask computed against the lidar features
    (camera trusted only where it agrees with lidar structure)."""

    threshold: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, pc):
        """img, pc (N, H, W, C) -> binary mask (N, H, W, C)."""
        n, h, w, c = img.shape
        pcf = pc.reshape(n, h * w, c)
        imf = img.reshape(n, h * w, c)
        # channel x channel attention (q=pc, k=v=img), per reference
        attn = jax.nn.softmax(
            jnp.einsum("bnc,bnd->bcd", pcf, imf)
            / jnp.sqrt(jnp.asarray(c, pcf.dtype)),
            axis=-1,
        )
        ctx = jnp.einsum("bcd,bnd->bnc", attn, imf)
        gate = jax.nn.sigmoid(nn.Dense(c, dtype=self.dtype)(ctx))
        return (gate > self.threshold).astype(img.dtype).reshape(img.shape)


class MultiModalBEVFusion(nn.Module):
    """sensor_blocks.py MultiModalFusion (:241-315), BEV analog.

    Returns (fused (N, H, W, C), thres_map (N, H, W)) where thres_map is 0
    on pixels seen by both modalities and 0.5 elsewhere."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, pc):
        c = pc.shape[-1]
        pc_mask = jnp.max((pc != 0).astype(pc.dtype), axis=-1, keepdims=True)
        img_mask = jnp.max((img != 0).astype(img.dtype), axis=-1, keepdims=True)

        gated = nn.relu(nn.Conv(c, (1, 1), dtype=self.dtype,
                                name="multigate")(pc)) * img
        both = nn.Conv(c, (1, 1), dtype=self.dtype, name="multifuse")(
            jnp.concatenate([gated, pc], axis=-1)
        )
        img_gate = ImgModalFusion(dtype=self.dtype)(img, pc)
        fused = (
            pc_mask * img_mask * both
            + pc * pc_mask * (1.0 - img_mask)
            + img * img_gate * (1.0 - pc_mask) * img_mask
        )
        thres_map = (0.5 * (1.0 - pc_mask * img_mask))[..., 0]
        return fused, thres_map


@register_model("airv2x_bm2cp")
class Airv2xBM2CP(PostBackboneFusionModel):
    keep_modal_encoder = True

    def setup_fusion(self):
        fcfg = self.args.get("bm2cp_fusion", {})
        comm = fcfg.get("communication", {})
        gauss = comm.get("gaussian_smooth")
        self.communication = Communication(
            threshold=comm.get("threshold", 0.01),
            smooth=gauss is not None,
            k_size=gauss["k_size"] if gauss else 5,
            c_sigma=gauss["c_sigma"] if gauss else 1.0,
        )
        self.mm_fusion = MultiModalBEVFusion(dtype=self.dtype)

    def __call__(self, batch, train: bool = False):
        x, modal = self.encoder(batch, train)  # keep_modal encoder
        b, l = x.shape[:2]

        def flat(a):
            return a.reshape((b * l,) + a.shape[2:])

        fused_bev, thres_map = self.mm_fusion(flat(modal["cam"]),
                                              flat(modal["lidar"]))
        feats, _ = self.backbone(fused_bev, train)
        if self.shrink_flag:
            feats = self.shrink_conv(feats, train)
        if self.compression:
            feats = self.compressor(feats, train)
        grouped = feats.reshape((b, l) + feats.shape[1:])

        # per-pixel modality threshold at the head resolution
        tm = thres_map.reshape((b, l) + thres_map.shape[1:])
        if tm.shape[-2:] != grouped.shape[2:4]:
            tm = jax.image.resize(tm, tm.shape[:2] + grouped.shape[2:4],
                                  "nearest")
        flat_g = grouped.reshape((b * l,) + grouped.shape[2:])
        if self.task == "det":
            conf = self.heads(flat_g)["psm"]
        else:
            # seg: cropped seg features as the confidence proxy, like the
            # reference's ori_x path (airv2x_bm2cp.py seg branch)
            _, conf = self.seg_head(flat_g, return_features=True)
        psm_single = conf.reshape((b, l) + conf.shape[1:3] + (-1,))
        if tm.shape[-2:] != psm_single.shape[2:4]:
            # seg: the confidence proxy lives on the cropped seg grid —
            # carry the modality-aware threshold map there too instead of
            # silently dropping it
            tm = jax.image.resize(
                tm, tm.shape[:2] + psm_single.shape[2:4], "nearest"
            )
        comm_mask, rate = self.communication(
            psm_single, batch["agent_mask"], train=train, thres_map=tm
        )
        if comm_mask.shape[-2:] != grouped.shape[2:4]:
            comm_mask = jax.image.resize(
                comm_mask, comm_mask.shape[:2] + grouped.shape[2:4], "bilinear"
            )
        gated = grouped * comm_mask[..., None]
        fused = ego_agent_attention(gated, batch["agent_mask"])

        if self.task == "det":
            out = dict(self.heads(fused))
        else:
            out = dict(self.seg_head(fused))
        out["comm_rate"] = rate
        return out
