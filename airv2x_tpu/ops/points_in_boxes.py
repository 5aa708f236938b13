"""Point-in-rotated-box tests and PointNet++-style set ops (device).

Replaces the reference's CUDA extensions:
  * roiaware_pool3d ``points_in_boxes_cpu/gpu`` (pcdet_utils/roiaware_pool3d,
    SURVEY.md N3) -> :func:`points_in_rotated_boxes`, a vectorized box-frame
    containment test;
  * pointnet2 stacked ops (pcdet_utils/pointnet2, N4/N5: furthest point
    sampling, ball query, three-NN interpolation) -> fixed-capacity jnp
    versions used by keypoint-style utilities.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def points_in_rotated_boxes(points, boxes, order: str = "hwl"):
    """(N, 3+) points x (M, 7) boxes -> (N, M) bool containment.

    Box-frame test: rotate each point into the box frame and compare with
    half extents — exact, no polygon work.
    """
    from airv2x_tpu.ops.geometry import boxes_to_lwh_order

    b = boxes_to_lwh_order(boxes, order)
    rel = points[:, None, :3] - b[None, :, 0:3]  # (N, M, 3)
    c, s = jnp.cos(b[:, 6]), jnp.sin(b[:, 6])
    # rotate by -yaw into box frame
    local_x = c[None, :] * rel[..., 0] + s[None, :] * rel[..., 1]
    local_y = -s[None, :] * rel[..., 0] + c[None, :] * rel[..., 1]
    local_z = rel[..., 2]
    return (
        (jnp.abs(local_x) <= b[None, :, 3] / 2)
        & (jnp.abs(local_y) <= b[None, :, 4] / 2)
        & (jnp.abs(local_z) <= b[None, :, 5] / 2)
    )


@partial(jax.jit, static_argnames=("num_samples",))
def farthest_point_sampling(points, mask, num_samples: int):
    """Iterative FPS over a padded (N, 3) cloud -> (num_samples,) indices.

    Twin of pointnet2 furthest_point_sampling; padding (mask=False) is never
    selected (unless fewer valid points than samples — then the first valid
    index repeats).
    """
    n = points.shape[0]
    inf = jnp.asarray(jnp.inf, points.dtype)
    dist = jnp.where(mask, inf, -inf)  # invalid never argmaxed
    first = jnp.argmax(mask)  # first valid point

    def body(i, state):
        dist, idxs = state
        last = points[idxs[i - 1]]
        d = jnp.sum((points - last) ** 2, axis=-1)
        dist = jnp.minimum(dist, jnp.where(mask, d, -inf))
        idxs = idxs.at[i].set(jnp.argmax(dist))
        return dist, idxs

    idxs = jnp.zeros((num_samples,), jnp.int32).at[0].set(first)
    _, idxs = jax.lax.fori_loop(1, num_samples, body, (dist, idxs))
    return idxs


@partial(jax.jit, static_argnames=("num_neighbors",))
def ball_query(centers, points, points_mask, radius, num_neighbors: int):
    """For each (M, 3) center: up to K neighbor indices within radius.

    Twin of pointnet2 ball_query, fixed capacity: returns (M, K) indices and
    (M, K) validity (first-K by index order, as the CUDA op).
    """
    d2 = jnp.sum((centers[:, None, :] - points[None, :, :3]) ** 2, axis=-1)
    ok = (d2 <= radius**2) & points_mask[None, :]
    # rank hits by point index: position of each hit among hits of the row
    rank = jnp.cumsum(ok, axis=-1) - 1
    key = jnp.where(ok & (rank < num_neighbors), rank, num_neighbors)
    m = centers.shape[0]
    idx = jnp.full((m, num_neighbors), 0, jnp.int32)
    src = jnp.broadcast_to(jnp.arange(points.shape[0]), ok.shape)
    row = jnp.broadcast_to(jnp.arange(m)[:, None], ok.shape)
    idx = idx.at[row, key].set(src.astype(jnp.int32), mode="drop")
    valid = (
        jnp.arange(num_neighbors)[None, :]
        < jnp.sum(ok, axis=-1, keepdims=True)
    )
    return idx, valid


def three_nn_interpolate(query, support, support_feats, support_mask):
    """Inverse-distance-weighted 3-NN feature interpolation.

    Twin of pointnet2 three_nn + three_interpolate: (Q, 3) queries, (S, 3)
    support with (S, C) features -> (Q, C).
    """
    d2 = jnp.sum((query[:, None, :] - support[None, :, :3]) ** 2, axis=-1)
    d2 = jnp.where(support_mask[None, :], d2, jnp.inf)
    neg_d2, idx = jax.lax.top_k(-d2, 3)  # (Q, 3)
    w = 1.0 / jnp.maximum(-neg_d2, 1e-8)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    feats = support_feats[idx]  # (Q, 3, C)
    return jnp.sum(feats * w[..., None], axis=1)
