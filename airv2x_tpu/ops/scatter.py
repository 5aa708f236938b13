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
