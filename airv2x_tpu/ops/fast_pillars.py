"""Sort-free PointPillars encoder: points -> BEV grid in one fused pass.

The classic pillar pipeline (ops/voxelize.py, behavioural twin of the
reference's SpVoxelPreprocessor + PillarVFE,
data_utils/pre_processor/sp_voxel_preprocessor.py:55-120 +
common_modules/airv2x_pillar_vfe.py:52-160) sorts points by cell id to build
a (P, K, F) pillar tensor, runs the PFN, then scatters pillar features to the
BEV grid. The sort and the (P, K, F) gather dominate the encoder cost on TPU
(~17 ms of a 25 ms encoder at 120k points).

This module exploits that the PFN's Linear/BN/ReLU are *pointwise over
points*: the max over a pillar's points commutes with everything before it.
So instead of sorting:

  1. cell id per point (elementwise),
  2. per-cell count + xyz sum via scatter-add -> per-cell mean,
  3. gather the mean back per point, build the standard 10-dim augmentation,
  4. one (N, 10) x (10, C) matmul + masked BN + ReLU over ALL points,
  5. scatter-max the per-point features straight into the (ny, nx, C) grid.

Measured 4.05 ms vs ~21 ms for the sort-based path at 120k points / 140k
cells on TPU v5e.

Semantics deltas vs the reference (documented, config-gated):
  * no ``max_points_per_voxel`` cap — every in-range point contributes to
    its pillar's max (the reference truncates to the first 32 after shuffle);
  * no ``max_voxel`` cap — all occupied cells are kept (the reference keeps
    the first 16k pillars);
  * BN statistics therefore see all points rather than the capped subset.
Both caps exist for torch memory layout reasons, not modelling ones; the
fast path has no per-pillar tensor to cap.

Only the single-PFN-layer configuration (the standard ``num_filters: [64]``)
is supported — multi-layer PFNs need the pillar-max broadcast back to points,
which reintroduces the gather (those configs fall back to the classic path).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


def point_cell_ids(points, mask, lidar_range, voxel_size, nx, ny):
    """Per-point flat BEV cell id.

    points (..., N, F>=3); mask (..., N) -> (ids (..., N) int32 in
    [0, ny*nx), valid (..., N)). Out-of-range points are invalidated.
    """
    x0, y0, z0, x1, y1, z1 = [float(v) for v in lidar_range[:6]]
    vx, vy = float(voxel_size[0]), float(voxel_size[1])
    ix = jnp.floor((points[..., 0] - x0) / vx).astype(jnp.int32)
    iy = jnp.floor((points[..., 1] - y0) / vy).astype(jnp.int32)
    valid = (
        mask
        & (ix >= 0)
        & (ix < nx)
        & (iy >= 0)
        & (iy < ny)
        & (points[..., 2] >= z0)
        & (points[..., 2] <= z1)
    )
    ids = jnp.clip(iy, 0, ny - 1) * nx + jnp.clip(ix, 0, nx - 1)
    return jnp.where(valid, ids, 0), valid


class FastPillarBEV(nn.Module):
    """Points straight to a (ny, nx, C) BEV map, no sort, no pillar tensor.

    Parameter structure mirrors a single PFNLayer (Dense + MaskedBatchNorm)
    so the math matches PillarVFE with ``num_filters: [C]`` exactly up to the
    capping deltas documented in the module docstring.
    """

    num_filters: Sequence[int]
    voxel_size: Sequence[float]
    lidar_range: Sequence[float]
    use_norm: bool = True
    with_distance: bool = False
    use_absolute_xyz: bool = True
    # hetero agents keep their own constants for the center-offset features
    # while voxelizing on the shared ego grid (airv2x_base_model.py:49-55);
    # None -> same as the grid constants.
    offset_voxel_size: Sequence[float] | None = None
    offset_lidar_range: Sequence[float] | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, mask, train: bool = False):
        """points (..., N, F>=4), mask (..., N) -> (..., ny, nx, C).

        Leading dims (batch, agents) are folded into one global scatter by
        offsetting cell ids, so BN statistics stay global over all points —
        matching the classic path's batched PillarVFE.
        """
        if len(self.num_filters) != 1:
            raise ValueError(
                "FastPillarBEV supports single-PFN-layer configs only; got "
                f"num_filters={list(self.num_filters)} (use the classic path)"
            )
        out_c = int(self.num_filters[0])
        lr, vs = self.lidar_range, self.voxel_size
        nx = int(round((lr[3] - lr[0]) / vs[0]))
        ny = int(round((lr[4] - lr[1]) / vs[1]))
        cells = ny * nx

        lead = points.shape[:-2]
        n = points.shape[-2]
        m = 1
        for d in lead:
            m *= d
        pts_flat = points.reshape(m * n, points.shape[-1])
        mask_flat = mask.reshape(m * n)

        ids, valid = point_cell_ids(pts_flat, mask_flat, lr, vs, nx, ny)
        # Spread invalid points uniformly over cells instead of parking them
        # all at cell 0: their contributions are already nullified (w=0 for
        # the mean sums, -1e9 for the max), but tens of thousands of
        # duplicate writes to ONE address serialize the TPU scatter —
        # measured 17 ms vs 5 ms per scene on padded clouds.
        spread = jnp.arange(ids.shape[0], dtype=jnp.int32) % cells
        ids = jnp.where(valid, ids, spread)
        row = jnp.repeat(jnp.arange(m, dtype=jnp.int32), n)
        gids = row * cells + ids  # offset ids: one scatter for all maps
        pts = pts_flat.astype(self.dtype)
        w = valid.astype(jnp.float32)

        # per-cell mean via one fused scatter-add of [1, x, y, z]
        ones_xyz = jnp.concatenate(
            [w[:, None], pts[:, :3].astype(jnp.float32) * w[:, None]], axis=1
        )
        cell_sums = jnp.zeros((m * cells, 4), jnp.float32).at[gids].add(ones_xyz)
        mean = cell_sums[:, 1:] / jnp.maximum(cell_sums[:, :1], 1.0)
        f_cluster = pts[:, :3] - mean[gids].astype(self.dtype)

        # cell-center offsets (identical formula to augment_pillar_points)
        ovs = self.offset_voxel_size or vs
        olr = self.offset_lidar_range or lr
        cx = ((ids % nx).astype(self.dtype) + 0.5) * ovs[0] + olr[0]
        cy = ((ids // nx).astype(self.dtype) + 0.5) * ovs[1] + olr[1]
        cz = jnp.full_like(cx, ovs[2] / 2 + olr[2])
        f_center = jnp.stack(
            [pts[:, 0] - cx, pts[:, 1] - cy, pts[:, 2] - cz], axis=-1
        )

        feats = [pts if self.use_absolute_xyz else pts[:, 3:], f_cluster, f_center]
        if self.with_distance:
            feats.append(jnp.linalg.norm(pts[:, :3], axis=-1, keepdims=True))
        x = jnp.concatenate(feats, axis=-1)
        x = jnp.where(valid[:, None], x, 0.0)

        from airv2x_tpu.models.nn import MaskedBatchNorm  # lazy: avoids
        # ops <-> models registry import cycle

        # One all-zero probe row rides along (mask False so it never touches
        # BN statistics): its output is relu(bn(0)) — the constant the
        # reference's zeroed padding rows contribute to every non-full
        # pillar's max (airv2x_pillar_vfe.py:152-158). We apply it as a
        # floor to every occupied cell; the only deviation left is pillars
        # with exactly max_points_per_voxel points, which have no padding
        # rows in the reference.
        probe = jnp.zeros((1, x.shape[-1]), x.dtype)
        x = jnp.concatenate([x, probe], axis=0)
        valid_ext = jnp.concatenate([valid, jnp.zeros((1,), bool)])
        x = nn.Dense(out_c, use_bias=not self.use_norm, dtype=self.dtype)(x)
        if self.use_norm:
            x = MaskedBatchNorm(dtype=self.dtype)(x, valid_ext, train)
        x = nn.relu(x)
        pad_floor = x[-1]  # (C,)
        x = x[:-1]

        neg = jnp.asarray(-1e9, x.dtype)
        x = jnp.where(valid[:, None], x, neg)
        grid = jnp.full((m * cells, out_c), neg, x.dtype).at[gids].max(x)
        occupied = grid > neg / 2
        grid = jnp.where(
            occupied, jnp.maximum(grid, pad_floor[None, :]), 0.0
        )
        return grid.reshape(lead + (ny, nx, out_c))
