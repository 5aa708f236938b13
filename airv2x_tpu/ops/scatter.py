"""Pillar -> dense BEV scatter (PointPillarScatter equivalent).

The reference loops over the batch on the host and fancy-indexes a dense
canvas per sample (models/common_modules/point_pillar_scatter.py:15-82).
Here it is a single batched scatter: featurized pillars (..., P, C) with zyx
``coords`` land on a (..., ny, nx, C) channel-last BEV canvas (NHWC is the
native TPU conv layout). Empty pillar slots carry mask=False and are dropped
via out-of-bounds indices.

The y axis becomes the image height and x the width, matching the
reference's canvas orientation (`spatial_features` [..., ny, nx]).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("ny", "nx"))
def scatter_pillars_to_bev(
    pillar_features: jnp.ndarray,
    coords: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    ny: int,
    nx: int,
) -> jnp.ndarray:
    """Scatter (P, C) pillar features into a (ny, nx, C) BEV canvas.

    coords: (P, 3) int32 zyx (z ignored — nz == 1 for pillars).
    mask: (P,) pillar occupancy.
    """
    y = jnp.where(mask, coords[:, 1], ny)  # OOB -> dropped
    x = jnp.where(mask, coords[:, 2], nx)
    canvas = jnp.zeros((ny, nx, pillar_features.shape[-1]), pillar_features.dtype)
    return canvas.at[y, x].set(pillar_features, mode="drop")


def scatter_pillars_to_bev_batch(pillar_features, coords, mask, *, ny, nx):
    """vmap over a leading batch/agent axis -> (B, ny, nx, C)."""
    return jax.vmap(partial(scatter_pillars_to_bev, ny=ny, nx=nx))(
        pillar_features, coords, mask
    )


@partial(jax.jit, static_argnames=("nz", "ny", "nx"))
def scatter_voxels_to_grid(voxel_features, coords, mask, *, nz, ny, nx):
    """Scatter (V, C) voxel features into a dense (nz, ny, nx, C) grid.

    3D analog of the pillar scatter — the dense-grid replacement for the
    reference's spconv sparse tensors (SURVEY.md N9 mapping): the radar z
    extent is shallow (~10 cells), so a dense grid + dense 3D convs map
    straight onto the MXU.
    """
    z = jnp.where(mask, coords[:, 0], nz)
    y = jnp.where(mask, coords[:, 1], ny)
    x = jnp.where(mask, coords[:, 2], nx)
    canvas = jnp.zeros((nz, ny, nx, voxel_features.shape[-1]), voxel_features.dtype)
    return canvas.at[z, y, x].set(voxel_features, mode="drop")


def scatter_voxels_to_grid_batch(voxel_features, coords, mask, *, nz, ny, nx):
    return jax.vmap(partial(scatter_voxels_to_grid, nz=nz, ny=ny, nx=nx))(
        voxel_features, coords, mask
    )
