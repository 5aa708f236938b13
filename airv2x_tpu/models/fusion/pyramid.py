"""HEAL pyramid fusion: multiscale occupancy-weighted warp-fuse.

Behavioural twin of fuse_modules/pyramid_fuse.py:16-170: a (ResNeXt) BEV
pyramid with a 1x1 occupancy head per level; per level, agent features and
sigmoid occupancy scores are warped into the ego frame and fused by a
softmax over agents of the warped scores (zero-score pixels excluded);
fused levels are deconv-decoded and concatenated.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from airv2x_tpu.models.fusion.common import NEG_INF
from airv2x_tpu.models.resnet_bev import ResNetBEVBackbone
from airv2x_tpu.ops.warp import normalized_pairwise_affine, warp_affine_normalized


def weighted_fuse(feats, scores, agent_mask, aff_to_ego, align_corners=False):
    """feats (B, L, H, W, C), scores (B, L, H, W, 1), aff_to_ego
    (B, L, 2, 3) normalized affines into the ego frame -> (B, H, W, C).

    Twin of pyramid_fuse.weighted_fuse (:16-62).
    """
    warped_f = warp_affine_normalized(feats, aff_to_ego, align_corners)
    warped_s = warp_affine_normalized(scores, aff_to_ego, align_corners)
    s = warped_s[..., 0]  # (B, L, H, W)
    valid = (s != 0.0) & agent_mask[:, :, None, None]
    s = jnp.where(valid, s, NEG_INF)
    s = s - jnp.max(s, axis=1, keepdims=True)
    wts = jnp.exp(s) * valid.astype(feats.dtype)
    denom = jnp.sum(wts, axis=1, keepdims=True)
    wts = jnp.where(denom > 0, wts / jnp.maximum(denom, 1e-9), 0.0)
    return jnp.sum(warped_f * wts[..., None], axis=1)


def cam_crop_mask(h, w, crop_ratios, dtype=jnp.float32):
    """Central-crop validity mask for camera-modality agents.

    Twin of pyramid_fuse.py:126-160 (cam_crop_info): a camera agent's BEV
    response is only trusted inside the central ``dim/ratio - 4`` window
    (edges are unstable); lidar agents (ratio <= 0) keep the full map.

    crop_ratios: (B, L, 2) [ratio_h, ratio_w] per agent -> (B, L, h, w, 1).
    """
    rh = crop_ratios[..., 0]
    rw = crop_ratios[..., 1]
    crop_h = jnp.where(rh > 0, h / jnp.maximum(rh, 1e-6) - 4.0, float(h))
    crop_w = jnp.where(rw > 0, w / jnp.maximum(rw, 1e-6) - 4.0, float(w))
    # reference: start = H//2 - crop//2, end = H//2 + crop//2 (int floors)
    sh = jnp.floor(h // 2 - jnp.floor(crop_h / 2))
    eh = jnp.floor(h // 2 + jnp.floor(crop_h / 2))
    sw = jnp.floor(w // 2 - jnp.floor(crop_w / 2))
    ew = jnp.floor(w // 2 + jnp.floor(crop_w / 2))
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    in_h = (ys[None, None, :] >= sh[..., None]) & (ys[None, None, :] < eh[..., None])
    in_w = (xs[None, None, :] >= sw[..., None]) & (xs[None, None, :] < ew[..., None])
    mask = in_h[..., :, None] & in_w[..., None, :]
    return mask.astype(dtype)[..., None]


class PyramidFusion(nn.Module):
    """ResNeXt pyramid + per-level occupancy heads + weighted warp-fuse."""

    args: dict  # the 'fusion_backbone' config block
    inplanes: int = 64
    dtype: Any = jnp.float32

    def setup(self):
        a = self.args
        self.resnet = ResNetBEVBackbone(
            layer_nums=a["layer_nums"],
            layer_strides=a["layer_strides"],
            num_filters=a["num_filters"],
            upsample_strides=a.get("upsample_strides", ()),
            num_upsample_filters=a.get("num_upsample_filter", ()),
            inplanes=a.get("inplanes", self.inplanes),
            resnext=bool(a.get("resnext")),
            dtype=self.dtype,
        )
        self.occ_heads = [
            nn.Conv(1, (1, 1), dtype=self.dtype, name=f"single_head_{i}")
            for i in range(len(a["layer_nums"]))
        ]
        self.align_corners = bool(a.get("align_corners", False))

    def forward_single(self, x, train: bool = False):
        """Single-agent pass: (N, H, W, C) -> (decoded, [occ maps])."""
        feats = self.resnet.get_multiscale_feature(x, train)
        occ = [head(f) for head, f in zip(self.occ_heads, feats)]
        return self.resnet.decode_multiscale(feats, train), occ

    def forward_collab(
        self, x, agent_mask, pairwise_t, discrete_ratio, downsample_rate,
        train: bool = False, cam_crop_ratios=None,
    ):
        """x: (B, L, H, W, C); pairwise_t: (B, L, 4, 4) cav->ego transforms.
        cam_crop_ratios: optional (B, L, 2) per-agent [ratio_h, ratio_w]
        camera crop ratios (<= 0 for lidar agents) — twin of the reference's
        cam_crop_info dict keyed by modality.

        Returns (fused (B, Hf, Wf, Cf), [occ maps (B*L, h_i, w_i, 1)]).
        """
        b, l = x.shape[:2]
        flat = x.reshape((b * l,) + x.shape[2:])
        feats = self.resnet.get_multiscale_feature(flat, train)

        fused_levels = []
        occ_maps = []
        for i, f in enumerate(feats):
            occ = self.occ_heads[i](f)
            occ_maps.append(occ)
            score = nn.sigmoid(occ) + 1e-4
            fg = f.reshape((b, l) + f.shape[1:])
            sg = score.reshape((b, l) + score.shape[1:])
            if cam_crop_ratios is not None:
                sg = sg * cam_crop_mask(
                    fg.shape[2], fg.shape[3], cam_crop_ratios, sg.dtype
                )
            aff = normalized_pairwise_affine(
                pairwise_t, fg.shape[2], fg.shape[3], discrete_ratio,
                downsample_rate,
            )
            fused_levels.append(
                weighted_fuse(fg, sg, agent_mask, aff, self.align_corners)
            )
        fused = self.resnet.decode_multiscale(fused_levels, train)
        return fused, occ_maps
