"""On-device point-cloud pillarization (the spconv voxel-generator replacement).

The reference voxelizes on the host with spconv's C++ ``Point2VoxelCPU3d``
(data_utils/pre_processor/sp_voxel_preprocessor.py:30-116), producing
``voxels (M, K, 4)``, zyx ``coords (M, 3)`` and ``num_points (M,)`` with caps
``max_voxels`` / ``max_points_per_voxel`` — inherently ragged and CPU-bound.

Here the whole transform is a shape-static XLA program that runs on TPU as
part of the jitted forward step:

  1. quantize points to integer cells and mask out-of-range / padding points;
  2. one stable sort by cell id (invalid points sort to the end);
  3. run-length segmentation of the sorted cell ids gives each point its
     pillar slot and within-pillar rank via cumsum/cummax — no loops;
  4. two scatters build the fixed-capacity ``(P, K, 4)`` pillar tensor and
     per-pillar metadata, dropping overflow exactly like spconv's caps.

Semantics match spconv up to pillar *ordering* (ours is cell-id order, spconv
is first-appearance order) — irrelevant downstream because consumers index
pillars only through ``coords``. Within-pillar point order is preserved
(stable sort), so the K-point truncation keeps the same points as spconv.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


class Pillars(NamedTuple):
    """Fixed-capacity pillarization result (single cloud).

    voxels:     (P, K, F) points grouped by pillar (zero-padded).
    coords:     (P, 3) int32 zyx cell coordinates (zeros for empty slots).
    num_points: (P,) int32 valid point count per pillar.
    mask:       (P,) bool pillar occupancy.
    """

    voxels: jnp.ndarray
    coords: jnp.ndarray
    num_points: jnp.ndarray
    mask: jnp.ndarray


@partial(jax.jit, static_argnames=("grid_size", "max_pillars", "max_points_per_pillar"))
def pillarize(
    points: jnp.ndarray,
    points_mask: jnp.ndarray,
    *,
    lidar_range: jnp.ndarray,
    voxel_size: jnp.ndarray,
    grid_size: Sequence[int],
    max_pillars: int,
    max_points_per_pillar: int,
) -> Pillars:
    """Voxelize one padded point cloud into fixed-capacity pillars.

    Parameters
    ----------
    points : (N, F) float32, F >= 3 (x, y, z, features...). Padding rows
        arbitrary.
    points_mask : (N,) bool, False for padding.
    lidar_range : (6,) [xmin, ymin, zmin, xmax, ymax, zmax].
    voxel_size : (3,) [vx, vy, vz].
    grid_size : static (nx, ny, nz) — must equal round((max-min)/voxel).
    max_pillars, max_points_per_pillar : static capacities (spconv's
        max_voxels / max_points_per_voxel).
    """
    n = points.shape[0]
    nx, ny, nz = grid_size
    p_cap, k_cap = max_pillars, max_points_per_pillar

    lo = jnp.asarray(lidar_range[:3], points.dtype)
    vs = jnp.asarray(voxel_size, points.dtype)
    idx_f = jnp.floor((points[:, :3] - lo) / vs)
    idx = idx_f.astype(jnp.int32)
    in_range = (
        (idx[:, 0] >= 0)
        & (idx[:, 0] < nx)
        & (idx[:, 1] >= 0)
        & (idx[:, 1] < ny)
        & (idx[:, 2] >= 0)
        & (idx[:, 2] < nz)
    )
    valid = in_range & points_mask

    cell = (idx[:, 2] * ny + idx[:, 1]) * nx + idx[:, 0]
    big = jnp.int32(nx * ny * nz)  # sentinel: sorts after every real cell
    cell = jnp.where(valid, cell, big)

    order = jnp.argsort(cell, stable=True)
    cell_s = cell[order]
    pts_s = points[order]
    valid_s = cell_s < big

    pos = jnp.arange(n, dtype=jnp.int32)
    new_run = jnp.concatenate(
        [jnp.array([True]), cell_s[1:] != cell_s[:-1]]
    ) & valid_s
    pillar_id = jnp.cumsum(new_run.astype(jnp.int32)) - 1  # (n,), -1 before 1st
    run_start = jax.lax.cummax(jnp.where(new_run, pos, -1))
    rank = pos - run_start  # within-pillar rank in original point order

    keep = valid_s & (rank < k_cap) & (pillar_id >= 0) & (pillar_id < p_cap)
    # Out-of-bounds indices + mode="drop" discard overflow points/pillars.
    pid = jnp.where(keep, pillar_id, p_cap)
    rnk = jnp.where(keep, rank, k_cap)

    voxels = jnp.zeros((p_cap, k_cap, points.shape[1]), points.dtype)
    voxels = voxels.at[pid, rnk].set(pts_s, mode="drop")

    num_points = jnp.zeros((p_cap,), jnp.int32).at[pid].add(
        keep.astype(jnp.int32), mode="drop"
    )

    start_keep = new_run & (pillar_id < p_cap)
    spid = jnp.where(start_keep, pillar_id, p_cap)
    cell_of_pillar = jnp.zeros((p_cap,), jnp.int32).at[spid].set(
        cell_s, mode="drop"
    )
    mask = jnp.zeros((p_cap,), bool).at[spid].set(start_keep, mode="drop")

    cz, rem = jnp.divmod(cell_of_pillar, ny * nx)
    cy, cx = jnp.divmod(rem, nx)
    coords = jnp.where(
        mask[:, None], jnp.stack([cz, cy, cx], axis=-1), 0
    ).astype(jnp.int32)

    return Pillars(voxels=voxels, coords=coords, num_points=num_points, mask=mask)


def pillarize_batch(points, points_mask, **kw):
    """vmap of :func:`pillarize` over a leading batch/agent axis."""
    fn = partial(pillarize, **kw)
    return jax.vmap(fn)(points, points_mask)
