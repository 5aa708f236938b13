"""Anchor grid generation and anchor-target assignment (device).

Replaces the host/Cython label-generation hot path of the reference
(voxel_postprocessor.generate_anchor_box :33-86 and generate_label_airv2x
:217-354 + box_overlaps.pyx) with a single vectorized XLA program that can
run per-sample inside the jitted train step.

Assignment semantics are matched exactly (covered by golden-style tests):
  * standup-box IoU in the legacy Fast-RCNN +1 convention;
  * positives: anchors with IoU > pos_threshold against any gt, plus each
    gt's best-overlap anchor (forced positive, if IoU > 0);
  * for an anchor matching several gts, the reference's np.unique
    first-occurrence rule resolves to: lowest-index gt among threshold
    matches if any, else lowest-index gt among forced matches;
  * negatives: anchors with all IoUs < neg_threshold, minus forced
    positives (but NOT minus threshold positives — faithful to the
    reference's ordering of those masks).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from airv2x_tpu.ops import geometry as geo
from airv2x_tpu.ops.boxes import encode_boxes


def generate_anchor_grid(anchor_args: dict, order: str = "hwl") -> np.ndarray:
    """Build the (H/stride, W/stride, num_anchor, 7) anchor grid (host, once).

    Mirrors generate_anchor_box (voxel_postprocessor.py:33-86): anchor
    centers on a linspace inset by one voxel from the lidar range, z fixed at
    -1, one anchor per rotation in ``r`` (degrees).
    """
    W, H = anchor_args["W"], anchor_args["H"]
    l, w, h = anchor_args["l"], anchor_args["w"], anchor_args["h"]
    rotations = [np.radians(r) for r in anchor_args["r"]]
    vw, vh = anchor_args["vw"], anchor_args["vh"]
    lr = anchor_args["cav_lidar_range"]
    stride = anchor_args.get("feature_stride", 2)

    x = np.linspace(lr[0] + vw, lr[3] - vw, W // stride)
    y = np.linspace(lr[1] + vh, lr[4] - vh, H // stride)
    cx, cy = np.meshgrid(x, y)  # (H/s, W/s)

    num = len(rotations)
    cx = np.tile(cx[..., None], num)
    cy = np.tile(cy[..., None], num)
    cz = np.full_like(cx, -1.0)
    ww = np.full_like(cx, w)
    ll = np.full_like(cx, l)
    hh = np.full_like(cx, h)
    rr = np.stack([np.full_like(cx[..., 0], r) for r in rotations], axis=-1)

    if order == "hwl":
        anchors = np.stack([cx, cy, cz, hh, ww, ll, rr], axis=-1)
    elif order == "lhw":
        anchors = np.stack([cx, cy, cz, ll, hh, ww, rr], axis=-1)
    else:
        raise ValueError(f"unknown order {order}")
    return anchors.astype(np.float32)


class AnchorTargets(NamedTuple):
    pos_equal_one: jnp.ndarray  # (H, W, A) float
    neg_equal_one: jnp.ndarray  # (H, W, A) float
    targets: jnp.ndarray  # (H, W, A * 7) float
    cls_labels: jnp.ndarray  # (H, W, A) int32


@partial(jax.jit, static_argnames=("pos_threshold", "neg_threshold"))
def assign_targets(
    gt_boxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    gt_class_ids: jnp.ndarray,
    anchors: jnp.ndarray,
    anchor_standup: jnp.ndarray,
    *,
    pos_threshold: float,
    neg_threshold: float,
) -> AnchorTargets:
    """Anchor target assignment for one sample.

    gt_boxes: (G, 7) hwl boxes padded to capacity; gt_mask: (G,) validity;
    gt_class_ids: (G,) int; anchors: (H, W, A, 7); anchor_standup:
    (H*W*A, 4) precomputed standup boxes of the anchors.
    """
    hw_shape = anchors.shape[:3]
    na = anchor_standup.shape[0]
    flat_anchors = anchors.reshape(na, 7)

    gt_corners = geo.boxes_to_corners_bev(gt_boxes, order="hwl")  # (G, 4, 2)
    gt_standup = geo.corners_to_standup_2d(gt_corners)  # (G, 4)

    iou = geo.aligned_iou_2d(anchor_standup, gt_standup)  # (Na, G)
    iou = jnp.where(gt_mask[None, :], iou, -1.0)

    ng = gt_boxes.shape[0]
    # Forced positives: each gt's argmax anchor (first on ties, as np.argmax).
    best_anchor = jnp.argmax(iou, axis=0)  # (G,)
    best_iou = jnp.max(iou, axis=0)
    force_valid = gt_mask & (best_iou > 0)
    # force[a, g] == anchor a is gt g's best anchor
    force = (
        jnp.zeros((na, ng), bool)
        .at[jnp.where(force_valid, best_anchor, na), jnp.arange(ng)]
        .set(force_valid, mode="drop")
    )

    thresh_pos = iou > pos_threshold  # (Na, G)
    anchor_pos = jnp.any(thresh_pos | force, axis=1)

    # Chosen gt per positive anchor: first threshold match if any, else first
    # forced match (reference np.unique first-occurrence semantics).
    first_thresh = jnp.argmax(thresh_pos, axis=1)
    first_force = jnp.argmax(force, axis=1)
    chosen_gt = jnp.where(jnp.any(thresh_pos, axis=1), first_thresh, first_force)

    # Negatives: every *valid* gt IoU below neg_threshold (padded gt slots
    # vacuously pass). With zero valid gts this makes every anchor negative,
    # matching the reference's empty-matrix behaviour (:293-296).
    below = (iou < neg_threshold) | ~gt_mask[None, :]
    anchor_neg = jnp.all(below, axis=1)
    # forced positives cleared from negatives (reference :341-345)
    anchor_neg = anchor_neg & ~jnp.any(force, axis=1)

    matched = flat_anchors  # (Na, 7)
    chosen_boxes = gt_boxes[chosen_gt]  # (Na, 7)
    tgt = encode_boxes(chosen_boxes, matched)  # (Na, 7)
    tgt = jnp.where(anchor_pos[:, None], tgt, 0.0)

    cls = jnp.where(anchor_pos, gt_class_ids[chosen_gt].astype(jnp.int32), 0)

    h, w, a = hw_shape
    return AnchorTargets(
        pos_equal_one=anchor_pos.reshape(h, w, a).astype(jnp.float32),
        neg_equal_one=anchor_neg.reshape(h, w, a).astype(jnp.float32),
        targets=tgt.reshape(h, w, a * 7).astype(jnp.float32),
        cls_labels=cls.reshape(h, w, a),
    )


def anchor_standup_boxes(anchors: np.ndarray) -> np.ndarray:
    """Precompute (H*W*A, 4) standup boxes for the anchor grid (host, once)."""
    import numpy as _np

    flat = anchors.reshape(-1, 7)
    corners = np.asarray(geo.boxes_to_corners_bev(jnp.asarray(flat), order="hwl"))
    out = _np.stack(
        [
            corners[..., 0].min(-1),
            corners[..., 1].min(-1),
            corners[..., 0].max(-1),
            corners[..., 1].max(-1),
        ],
        axis=-1,
    )
    return out.astype(_np.float32)
