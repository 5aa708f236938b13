"""Box geometry on device (jax.numpy).

Boxes are 7-DoF ``[x, y, z, s3, s4, s5, yaw]`` where the size triplet is either
``hwl`` (PointPillar convention: s3=h, s4=w, s5=l — used throughout AirV2X) or
``lwh``. Corner layout matches the reference (box_utils.py:195-259): indices
0-3 are the bottom face, 4-7 the top face, with corner k+4 above corner k.

All functions broadcast over arbitrary leading batch dimensions and are
jit/vmap friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Unit-cube template: (8, 3) offsets in box frame (l along x, w along y, h
# along z), halved. Ordering per the reference corner diagram
# (box_utils.py:196-204).
_CORNER_TEMPLATE = jnp.array(
    [
        [1, -1, -1],
        [1, 1, -1],
        [-1, 1, -1],
        [-1, -1, -1],
        [1, -1, 1],
        [1, 1, 1],
        [-1, 1, 1],
        [-1, -1, 1],
    ],
    dtype=jnp.float32,
) * 0.5


def boxes_to_lwh_order(boxes: jnp.ndarray, order: str) -> jnp.ndarray:
    """Reorder the size columns of (..., 7) boxes to l, w, h."""
    if order == "lwh":
        return boxes
    if order == "hwl":
        return boxes[..., jnp.array([0, 1, 2, 5, 4, 3, 6])]
    raise ValueError(f"unknown box order: {order}")


def rotate_points_z(points: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotate (..., N, 3) points by (...,) yaw angles about +z.

    Elementwise (VPU) rather than a tiny matmul: exact in f32 regardless of
    the backend's default matmul precision, and cheaper for 3-vectors.
    """
    c, s = jnp.cos(angle)[..., None], jnp.sin(angle)[..., None]
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    return jnp.stack([c * x - s * y, s * x + c * y, z], axis=-1)


def boxes_to_corners_3d(boxes: jnp.ndarray, order: str = "hwl") -> jnp.ndarray:
    """(..., 7) boxes -> (..., 8, 3) corners.

    Behavioural twin of reference box_utils.boxes_to_corners_3d (:195).
    """
    b = boxes_to_lwh_order(boxes, order)
    corners = b[..., None, 3:6] * _CORNER_TEMPLATE  # (..., 8, 3)
    corners = rotate_points_z(corners, b[..., 6])
    return corners + b[..., None, 0:3]


def boxes_to_corners_bev(boxes: jnp.ndarray, order: str = "hwl") -> jnp.ndarray:
    """(..., 7) boxes -> (..., 4, 2) bottom-face BEV corners (x, y)."""
    return boxes_to_corners_3d(boxes, order)[..., :4, :2]


def project_corners(corners: jnp.ndarray, transform: jnp.ndarray) -> jnp.ndarray:
    """Rigid-project (..., K, 3) corners with a (..., 4, 4) transform.

    Twin of reference box_utils.project_box3d (:332), batched.
    """
    rot = transform[..., :3, :3]
    trans = transform[..., :3, 3]
    out = jnp.matmul(
        corners, jnp.swapaxes(rot, -1, -2), precision=jax.lax.Precision.HIGHEST
    )
    return out + trans[..., None, :]


def project_points(points: jnp.ndarray, transform: jnp.ndarray) -> jnp.ndarray:
    """Rigid-project (..., N, 3+) points; feature columns pass through."""
    xyz = jnp.matmul(
        points[..., :3],
        jnp.swapaxes(transform[..., :3, :3], -1, -2),
        precision=jax.lax.Precision.HIGHEST,
    )
    xyz = xyz + transform[..., None, :3, 3]
    return jnp.concatenate([xyz, points[..., 3:]], axis=-1)


def corners_to_standup_2d(corners: jnp.ndarray) -> jnp.ndarray:
    """(..., K, 2+) corners -> (..., 4) axis-aligned [x1, y1, x2, y2]."""
    x1 = jnp.min(corners[..., 0], axis=-1)
    y1 = jnp.min(corners[..., 1], axis=-1)
    x2 = jnp.max(corners[..., 0], axis=-1)
    y2 = jnp.max(corners[..., 1], axis=-1)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def aligned_iou_2d(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise axis-aligned IoU of (N, 4) x (M, 4) standup boxes -> (N, M).

    Replaces the Cython ``bbox_overlaps`` hot path of anchor label generation
    (utils/box_overlaps.pyx, voxel_postprocessor.py:142-145) with one
    broadcasted XLA program. Matches its +1-free geometric convention? No —
    the Cython kernel uses the (x2-x1+1) pixel convention; the AirV2X label
    generator feeds it *metric* standup boxes, so we follow the same pixel
    convention to preserve assignment parity (see tests/test_anchors.py).
    """
    # Reference box_overlaps.pyx computes areas/overlaps with a "+1" term.
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt + 1.0, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area1 = (boxes1[:, 2] - boxes1[:, 0] + 1.0) * (boxes1[:, 3] - boxes1[:, 1] + 1.0)
    area2 = (boxes2[:, 2] - boxes2[:, 0] + 1.0) * (boxes2[:, 3] - boxes2[:, 1] + 1.0)
    union = area1[:, None] + area2[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def corner_to_center(corners: jnp.ndarray, order: str = "hwl") -> jnp.ndarray:
    """(..., 8, 3) corners -> (..., 7) boxes. Inverse of boxes_to_corners_3d.

    Uses the same 4-edge averaging as the reference corner_to_center
    (box_utils.py:28-134) for robustness to slightly non-rigid corners.
    """
    xyz = jnp.mean(corners[..., [0, 3, 5, 6], :], axis=-2)
    h = jnp.abs(jnp.mean(corners[..., 4:, 2] - corners[..., :4, 2], axis=-1))

    def _edge(i, j):
        d = corners[..., i, :2] - corners[..., j, :2]
        return jnp.linalg.norm(d, axis=-1)

    l = (_edge(0, 3) + _edge(2, 1) + _edge(4, 7) + _edge(5, 6)) / 4.0
    w = (_edge(0, 1) + _edge(2, 3) + _edge(4, 5) + _edge(6, 7)) / 4.0

    def _angle(i, j):
        d = corners[..., i, :2] - corners[..., j, :2]
        return jnp.arctan2(d[..., 1], d[..., 0])

    theta = (_angle(1, 2) + _angle(0, 3) + _angle(5, 6) + _angle(4, 7)) / 4.0
    if order == "hwl":
        size = jnp.stack([h, w, l], axis=-1)
    elif order == "lwh":
        size = jnp.stack([l, w, h], axis=-1)
    else:
        raise ValueError(order)
    return jnp.concatenate([xyz, size, theta[..., None]], axis=-1)


def mask_boxes_in_range_bev(corners: jnp.ndarray, limit_range) -> jnp.ndarray:
    """(..., N, 8, 3) corners -> (..., N) bool: all BEV corners inside range.

    Twin of get_mask_for_boxes_within_range_torch (box_utils.py:399).
    """
    lo = jnp.asarray(limit_range[:2], dtype=corners.dtype)
    hi = jnp.asarray(limit_range[3:5], dtype=corners.dtype)
    ok = jnp.all(corners[..., :2] >= lo, axis=-1) & jnp.all(
        corners[..., :2] <= hi, axis=-1
    )
    return jnp.all(ok, axis=-1)


def keep_reasonable_boxes(
    corners: jnp.ndarray, z_min: float, z_max: float, max_xy: float = 6.0
) -> jnp.ndarray:
    """(..., N, 8, 3) -> (..., N) bool mask combining the reference's
    remove_large_pred_bbx (box_utils.py:981) and remove_bbx_abnormal_z (:1017).
    """
    x_len = jnp.max(corners[..., 0], axis=-1) - jnp.min(corners[..., 0], axis=-1)
    y_len = jnp.max(corners[..., 1], axis=-1) - jnp.min(corners[..., 1], axis=-1)
    z_lo = jnp.min(corners[..., 2], axis=-1)
    z_hi = jnp.max(corners[..., 2], axis=-1)
    small = (x_len <= max_xy) & (y_len <= max_xy)
    z_ok = (z_lo >= z_min) & (z_hi <= z_max)
    return small & z_ok


def limit_period(val, offset: float = 0.5, period: float = 2.0 * jnp.pi):
    return val - jnp.floor(val / period + offset) * period
