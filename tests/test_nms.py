import jax.numpy as jnp
import numpy as np

from airv2x_tpu.ops import geometry as geo
from airv2x_tpu.ops.nms import rotated_nms
from airv2x_tpu.ops.rotated_iou import pairwise_quad_iou


def _corners(boxes):
    return geo.boxes_to_corners_bev(jnp.asarray(boxes, jnp.float32), order="hwl")


def _host_greedy_nms(quads, scores, valid, thresh):
    """Independent host implementation mirroring reference box_utils.nms_rotated."""
    iou = np.asarray(pairwise_quad_iou(jnp.asarray(quads), jnp.asarray(quads)))
    order = np.argsort(-scores, kind="stable")
    order = [i for i in order if valid[i]]
    keep = []
    while order:
        i = order.pop(0)
        keep.append(i)
        order = [j for j in order if iou[i, j] <= thresh]
    return sorted(keep)


def test_nms_suppresses_duplicates():
    boxes = np.array(
        [
            [0, 0, 0, 1.5, 2, 4, 0.0],
            [0.1, 0.05, 0, 1.5, 2, 4, 0.02],  # near-duplicate, lower score
            [20, 0, 0, 1.5, 2, 4, 0.0],  # far away
        ],
        dtype=np.float32,
    )
    scores = jnp.array([0.9, 0.8, 0.7])
    valid = jnp.array([True, True, True])
    keep = np.asarray(rotated_nms(_corners(boxes), scores, valid, 0.15))
    assert keep.tolist() == [True, False, True]


def test_nms_respects_validity():
    boxes = np.array(
        [[0, 0, 0, 1.5, 2, 4, 0.0], [30, 0, 0, 1.5, 2, 4, 0.0]], dtype=np.float32
    )
    scores = jnp.array([0.9, 0.8])
    valid = jnp.array([True, False])
    keep = np.asarray(rotated_nms(_corners(boxes), scores, valid, 0.15))
    assert keep.tolist() == [True, False]


def test_nms_matches_host_greedy(rng):
    n = 128
    boxes = np.stack(
        [
            rng.uniform(-30, 30, n),
            rng.uniform(-10, 10, n),
            np.zeros(n),
            np.full(n, 1.5),
            rng.uniform(1.5, 2.5, n),
            rng.uniform(3.5, 5.0, n),
            rng.uniform(-np.pi, np.pi, n),
        ],
        axis=-1,
    ).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    valid = rng.uniform(size=n) > 0.2
    quads = np.asarray(_corners(boxes))

    keep = np.asarray(
        rotated_nms(jnp.asarray(quads), jnp.asarray(scores), jnp.asarray(valid), 0.15)
    )
    expected = _host_greedy_nms(quads, scores, valid, 0.15)
    assert sorted(np.flatnonzero(keep).tolist()) == expected


def test_nms_top_k_cap():
    n = 32
    boxes = np.zeros((n, 7), dtype=np.float32)
    boxes[:, 0] = np.arange(n) * 50.0  # all disjoint
    boxes[:, 3:6] = [1.5, 2.0, 4.0]
    scores = jnp.asarray(np.linspace(1.0, 0.1, n, dtype=np.float32))
    valid = jnp.ones(n, dtype=bool)
    keep = np.asarray(rotated_nms(_corners(boxes), scores, valid, 0.15, top_k=8))
    # only the 8 best survive the cap
    assert keep.sum() == 8
    assert np.all(np.flatnonzero(keep) == np.arange(8))
