"""Flat BM2CP building blocks (flax twins of
bm2cp_modules/{sensor_blocks, attentioncomm}.py, used by
models/point_pillar_bm2cp.py).

  * ``BM2CPUp`` — sensor_blocks.Up (:128-158): align_corners bilinear
    upsample + pad + concat + ONE conv-bn-relu (the LSS Up has two);
  * ``ImgCamEncode`` — (:68-212): EfficientNet-b0 trunk (shared faithful
    implementation, models/camera/trunks.py) + Up fusion + image/depth
    heads; the ground-truth depth map is min-pooled to feature resolution,
    one-hot-embedded where observed and blended with the predicted depth
    softmax elsewhere;
  * ``MultiModalFusion`` / ``ImgModalFusion`` — (:215-310): occupancy-mask
    routed voxel fusion of the camera and pillar volumes with a gated 3D
    conv blend, per-pixel attention mask for camera-only voxels, and the
    threshold map consumed by the collaborative stage;
  * ``atten_comm_fuse`` — attentioncomm.py: confidence-vs-threshold-map
    communication masks (even-slot quirk preserved) + per-level
    pixel-wise agent self-attention.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from airv2x_tpu.models.camera.trunks import (
    EfficientNetB0Features,
    TORCH_BN_EPS,
    TORCH_BN_MOMENTUM,
    pad_or_crop_to,
    upsample_align_corners,
)


class BM2CPUp(nn.Module):
    """sensor_blocks.Up (:128-158) — single conv-bn-relu after concat."""

    out_c: int
    scale: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        x = upsample_align_corners(
            x, x.shape[-3] * self.scale, x.shape[-2] * self.scale
        )
        x = pad_or_crop_to(x, skip.shape[-3], skip.shape[-2])
        x = jnp.concatenate([skip, x], axis=-1)
        x = nn.Conv(self.out_c, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv0")(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=TORCH_BN_MOMENTUM, epsilon=TORCH_BN_EPS,
                         dtype=self.dtype, name="bn0")(x)
        return nn.relu(x)


class ImgCamEncode(nn.Module):
    """sensor_blocks.ImgCamEncode (:68-212)."""

    depth_bins: int
    context_c: int
    downsample: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, imgs, depth_map, train: bool = False):
        """imgs (B*, H, W, 3); depth_map (B*, H, W) — the (possibly
        ego-composited) observed depth in BIN units, negative where
        unobserved. Returns lifted (B*, fH, fW, D, C)."""
        red3, red4, red5 = EfficientNetB0Features(
            dtype=self.dtype, name="trunk"
        )(imgs, train)
        feat = BM2CPUp(256, scale=2, dtype=self.dtype, name="up1")(
            red5, red4, train
        )
        if self.downsample == 8:
            feat = BM2CPUp(256, scale=2, dtype=self.dtype, name="up2")(
                feat, red3, train
            )
        context = nn.Conv(self.context_c, (1, 1), dtype=self.dtype,
                          name="image_head")(feat)

        # resize depth: negatives -> max+1, min-pool, back to 0 (:177-188)
        f_h, f_w = feat.shape[-3], feat.shape[-2]
        h, w = depth_map.shape[-2], depth_map.shape[-1]
        max_value = jnp.max(depth_map)
        d = jnp.where(depth_map < 0, max_value + 1, depth_map)
        sh, sw = h // f_h, w // f_w
        d = -nn.max_pool(
            (-d)[..., None], (sh, sw), strides=(sh, sw)
        )[..., 0]
        d = jnp.where(d > max_value, 0.0, d)

        observed = (d > 0)[..., None]
        one_hot = jax.nn.one_hot(
            jnp.clip(d.astype(jnp.int32), 0, self.depth_bins - 1),
            self.depth_bins,
        )
        depth_logits = nn.Conv(self.depth_bins, (1, 1), dtype=self.dtype,
                               name="depth_head")(feat)
        depth_pred = jax.nn.softmax(depth_logits, axis=-1)
        final_depth = jnp.where(observed, one_hot, depth_pred)
        return final_depth[..., :, None] * context[..., None, :]


def fuse_ego_depth(depth_maps, agent_mask):
    """The T=2 ego-composite (sensor_blocks.py:133-164): each sample's ego
    depth map is overwritten, where unobserved, by the min over all present
    agents' ego-view projections.

    depth_maps (B, L, 2, H, W): [:, :, 0] self-view, [:, :, 1] ego-view
    (negative = unobserved). Returns per-agent maps (B, L, H, W)."""
    self_view = depth_maps[:, :, 0]
    ego_view = depth_maps[:, :, 1]
    big = jnp.max(ego_view) + 1.0
    m = agent_mask[:, :, None, None]
    candidates = jnp.where((ego_view < 0) | ~m, big, ego_view)
    fused = jnp.min(candidates, axis=1)  # (B, H, W)
    fused = jnp.where(fused >= big, -1.0, fused)
    ego_mask = (self_view[:, 0] > 0).astype(fused.dtype)
    new_ego = self_view[:, 0] * ego_mask + fused * (1.0 - ego_mask)
    return jnp.concatenate([new_ego[:, None], self_view[:, 1:]], axis=1)


class MultiModalFusion(nn.Module):
    """sensor_blocks.MultiModalFusion (:242-310), channel-last 5D."""

    dim: int
    threshold: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img_voxel, pc_voxel):
        """img/pc voxel (B, Z, Y, X, C) -> (fused (B, Y, X, C*Z),
        thres_map (B, Y, X, 1), mask (B, Y, X, 1))."""
        b, z, y, x, c = pc_voxel.shape
        pc_mask = jnp.max(
            (pc_voxel != 0).astype(pc_voxel.dtype), axis=-1, keepdims=True
        )
        img_mask = jnp.max(
            (img_voxel != 0).astype(pc_voxel.dtype), axis=-1, keepdims=True
        )

        gate = nn.relu(
            nn.Conv(self.dim, (1, 1, 1), dtype=self.dtype, name="multigate")(
                pc_voxel
            )
        )
        blended = nn.Conv(self.dim, (1, 1, 1), dtype=self.dtype,
                          name="multifuse")(
            jnp.concatenate([gate * img_voxel, pc_voxel], axis=-1)
        )

        # ImgModalFusion (:215-239): per-voxel-channel attention mask for
        # camera-only voxels (queries = pillar volume rows)
        pc_flat = pc_voxel.reshape(b, z * y * x, c).transpose(0, 2, 1)
        img_flat = img_voxel.reshape(b, z * y * x, c).transpose(0, 2, 1)
        score = jnp.einsum("bcn,bdn->bcd", pc_flat, img_flat) / jnp.sqrt(
            jnp.asarray(c, jnp.float32)
        )
        attn = jax.nn.softmax(score, axis=-1)
        vmask = jnp.einsum("bcd,bdn->bcn", attn, img_flat)
        vmask = jax.nn.sigmoid(
            nn.Dense(self.dim, dtype=self.dtype, name="img_proj")(
                vmask.transpose(0, 2, 1)
            )
        ).transpose(0, 2, 1)
        vmask = (vmask > self.threshold).astype(pc_voxel.dtype)
        vmask = vmask.transpose(0, 2, 1).reshape(b, z, y, x, c)
        vmask = vmask.at[0].set(1.0)  # quirk: first row fully kept (:237)

        fused = (
            pc_mask * img_mask * blended
            + pc_voxel * pc_mask * (1 - img_mask)
            + img_voxel * vmask * (1 - pc_mask) * img_mask
        )

        thres = (
            pc_mask * (1 - img_mask) * 0.5
            + (1 - pc_mask) * img_mask * 0.5
            + (1 - pc_mask) * (1 - img_mask) * 0.5
        )
        mask_code = (
            pc_mask * img_mask
            + pc_mask * (1 - img_mask) * 2
            + (1 - pc_mask) * img_mask * 3
            + (1 - pc_mask) * (1 - img_mask) * 4
        )
        thres_map = jnp.min(thres, axis=1)  # collapse Z -> (B, Y, X, 1)
        mask_map = jnp.min(mask_code, axis=1)
        fused_2d = jnp.moveaxis(fused, 1, -1).reshape(b, y, x, c * z)
        return fused_2d, thres_map, mask_map
