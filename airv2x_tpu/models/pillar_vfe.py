"""PointPillars voxel feature encoder (PillarVFE) — flax, fixed capacity.

Behavioural twin of the reference PillarVFE
(models/common_modules/airv2x_pillar_vfe.py:52-160): per-point 10-dim
augmentation (raw xyzi + cluster offset + center offset), masked PFN layers
(Linear -> BN -> ReLU -> masked max over the K points of a pillar).

TPU-first differences: operates on the fixed (P, K, F) pillar tensor from
ops.voxelize (no 50k-row chunking workaround needed — XLA tiles the matmul),
and BN statistics are computed under the point mask so padding does not
pollute them (identical at inference where running stats are used).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from airv2x_tpu.models.nn import MaskedBatchNorm


class PFNLayer(nn.Module):
    """Linear -> BN -> ReLU -> max over the K point rows of each pillar.

    Faithful to the reference PFNLayer (airv2x_pillar_vfe.py:10-49) including
    its padding semantics: padded point rows are zeroed at the *input*
    (``features *= mask`` :152-154) but still flow through Linear/BN/ReLU, so
    every non-full pillar's max includes the relu(bn(0)) constant. BN batch
    statistics therefore cover all K rows of occupied pillars; the
    ``pillar_mask`` only excludes the empty pillar *slots* our
    fixed-capacity layout adds (the reference's ragged M list has none).
    """

    out_channels: int
    use_norm: bool = True
    last_layer: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, pillar_mask, train: bool = False):
        # feats: (P, K, Cin) with padded rows already zeroed; pillar_mask: (P,)
        out_c = self.out_channels if self.last_layer else self.out_channels // 2
        x = nn.Dense(out_c, use_bias=not self.use_norm, dtype=self.dtype)(feats)
        if self.use_norm:
            row_mask = jnp.broadcast_to(pillar_mask[..., None], x.shape[:-1])
            x = MaskedBatchNorm(dtype=self.dtype)(x, row_mask, train)
        x = nn.relu(x)
        x_max = jnp.max(x, axis=-2, keepdims=True)  # (P, 1, C)
        if self.last_layer:
            return x_max[..., 0, :]  # (P, C)
        rep = jnp.broadcast_to(x_max, x.shape[:-1] + (out_c,))
        return jnp.concatenate([x, rep], axis=-1)


def augment_pillar_points(
    voxels,
    num_points,
    coords,
    *,
    voxel_size,
    lidar_range,
    use_absolute_xyz=True,
    with_distance=False,
    dtype=jnp.float32,
):
    """The 10-dim per-point augmentation shared by all pillar encoders
    (airv2x_pillar_vfe.py:96-130): raw xyzi + cluster offset + center offset
    (+ optional distance). Returns (feats (P, K, F'), point_mask (P, K))."""
    k = voxels.shape[-2]
    pts = voxels.astype(dtype)
    cnt = jnp.maximum(num_points, 1).astype(dtype)[..., None, None]
    point_mask = jnp.arange(k)[None, :] < num_points[..., None]

    mean = jnp.sum(
        jnp.where(point_mask[..., None], pts[..., :3], 0.0), axis=-2, keepdims=True
    ) / cnt
    f_cluster = pts[..., :3] - mean

    vx, vy, vz = voxel_size
    x0, y0, z0 = lidar_range[:3]
    cx = coords[..., 2, None].astype(dtype) * vx + (vx / 2 + x0)
    cy = coords[..., 1, None].astype(dtype) * vy + (vy / 2 + y0)
    cz = coords[..., 0, None].astype(dtype) * vz + (vz / 2 + z0)
    f_center = jnp.stack(
        [pts[..., 0] - cx, pts[..., 1] - cy, pts[..., 2] - cz], axis=-1
    )

    feats = [pts if use_absolute_xyz else pts[..., 3:], f_cluster, f_center]
    if with_distance:
        feats.append(jnp.linalg.norm(pts[..., :3], axis=-1, keepdims=True))
    x = jnp.concatenate(feats, axis=-1)
    return jnp.where(point_mask[..., None], x, 0.0), point_mask


class PillarVFE(nn.Module):
    """(P, K, 4) pillars -> (P, C) pillar features."""

    num_filters: Sequence[int]
    voxel_size: Sequence[float]
    lidar_range: Sequence[float]
    use_norm: bool = True
    with_distance: bool = False
    use_absolute_xyz: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, voxels, num_points, coords, pillar_mask, train: bool = False):
        """voxels (P, K, 4), num_points (P,), coords (P, 3) zyx,
        pillar_mask (P,) -> (P, num_filters[-1])."""
        x, point_mask = augment_pillar_points(
            voxels,
            num_points,
            coords,
            voxel_size=self.voxel_size,
            lidar_range=self.lidar_range,
            use_absolute_xyz=self.use_absolute_xyz,
            with_distance=self.with_distance,
            dtype=self.dtype,
        )

        del point_mask  # padding handled by input zeroing, as in the reference
        filters = list(self.num_filters)
        for i, out_c in enumerate(filters):
            x = PFNLayer(
                out_c,
                use_norm=self.use_norm,
                last_layer=(i == len(filters) - 1),
                dtype=self.dtype,
            )(x, pillar_mask, train)

        return x * pillar_mask[..., None].astype(x.dtype)  # (P, C)
