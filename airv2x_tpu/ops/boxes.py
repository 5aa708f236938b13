"""Anchor-relative 7-DoF box encoding / decoding (device).

Matches the reference's delta parameterization exactly
(voxel_postprocessor.generate_label_airv2x targets, :313-334, and
delta_to_boxes3d, :585-634): hwl box layout, xy normalized by the anchor BEV
diagonal, z by anchor height, log-ratio sizes, additive yaw.
"""

from __future__ import annotations

import jax.numpy as jnp


def anchor_diagonal(anchors: jnp.ndarray) -> jnp.ndarray:
    """(..., 7) hwl anchors -> (...,) BEV diagonal sqrt(w^2 + l^2)."""
    return jnp.sqrt(anchors[..., 4] ** 2 + anchors[..., 5] ** 2)


def encode_boxes(gt: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Encode (..., 7) hwl gt boxes against aligned (..., 7) anchors."""
    d = anchor_diagonal(anchors)
    dx = (gt[..., 0] - anchors[..., 0]) / d
    dy = (gt[..., 1] - anchors[..., 1]) / d
    dz = (gt[..., 2] - anchors[..., 2]) / anchors[..., 3]
    dh = jnp.log(gt[..., 3] / anchors[..., 3])
    dw = jnp.log(gt[..., 4] / anchors[..., 4])
    dl = jnp.log(gt[..., 5] / anchors[..., 5])
    dr = gt[..., 6] - anchors[..., 6]
    return jnp.stack([dx, dy, dz, dh, dw, dl, dr], axis=-1)


def decode_boxes(deltas: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Decode (..., 7) deltas against aligned (..., 7) hwl anchors."""
    d = anchor_diagonal(anchors)
    x = deltas[..., 0] * d + anchors[..., 0]
    y = deltas[..., 1] * d + anchors[..., 1]
    z = deltas[..., 2] * anchors[..., 3] + anchors[..., 2]
    hwl = jnp.exp(deltas[..., 3:6]) * anchors[..., 3:6]
    r = deltas[..., 6] + anchors[..., 6]
    return jnp.concatenate(
        [jnp.stack([x, y, z], axis=-1), hwl, r[..., None]], axis=-1
    )
