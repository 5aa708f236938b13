import jax.numpy as jnp
import numpy as np

from airv2x_tpu.ops import anchors as anc
from airv2x_tpu.ops.boxes import decode_boxes, encode_boxes

ANCHOR_ARGS = {
    "W": 32,
    "H": 16,
    "l": 3.9,
    "w": 1.6,
    "h": 1.56,
    "r": [0, 90],
    "feature_stride": 2,
    "vw": 0.4,
    "vh": 0.4,
    "cav_lidar_range": [-6.4, -3.2, -3, 6.4, 3.2, 1],
    "num": 2,
}


def _grid():
    return anc.generate_anchor_grid(ANCHOR_ARGS)


def test_anchor_grid_shape_and_values():
    g = _grid()
    assert g.shape == (8, 16, 2, 7)
    # centers inset by one voxel, z=-1, sizes constant, rotations 0 / pi/2
    np.testing.assert_allclose(g[0, 0, 0, 0], -6.4 + 0.4)
    np.testing.assert_allclose(g[0, 0, 0, 1], -3.2 + 0.4)
    np.testing.assert_allclose(g[..., 2], -1.0)
    np.testing.assert_allclose(g[..., 3], 1.56)
    np.testing.assert_allclose(g[..., 4], 1.6)
    np.testing.assert_allclose(g[..., 5], 3.9)
    np.testing.assert_allclose(g[..., 0, 6], 0.0)
    np.testing.assert_allclose(g[..., 1, 6], np.pi / 2)
    # x increases along W axis, y along H axis
    assert g[0, 1, 0, 0] > g[0, 0, 0, 0]
    assert g[1, 0, 0, 1] > g[0, 0, 0, 1]


def _assign(gt, mask, cls):
    g = _grid()
    standup = anc.anchor_standup_boxes(g)
    return anc.assign_targets(
        jnp.asarray(gt, jnp.float32),
        jnp.asarray(mask),
        jnp.asarray(cls, jnp.int32),
        jnp.asarray(g),
        jnp.asarray(standup),
        pos_threshold=0.6,
        neg_threshold=0.45,
    )


def test_assign_gt_on_anchor():
    # gt box exactly on an anchor location/size -> that anchor positive
    g = _grid()
    gt = np.zeros((5, 7), np.float32)
    gt[0] = g[4, 8, 0]  # exact anchor
    mask = np.zeros(5, bool)
    mask[0] = True
    cls = np.zeros(5, np.int32)
    cls[0] = 3
    out = _assign(gt, mask, cls)
    pos = np.asarray(out.pos_equal_one)
    assert pos[4, 8, 0] == 1
    assert np.asarray(out.cls_labels)[4, 8, 0] == 3
    # exact match -> zero regression targets there
    tgt = np.asarray(out.targets).reshape(8, 16, 2, 7)
    np.testing.assert_allclose(tgt[4, 8, 0], 0.0, atol=1e-6)
    # the same-location 90deg anchor is not negative if forced, but at least
    # the far corner anchor must be negative
    neg = np.asarray(out.neg_equal_one)
    assert neg[0, 0, 0] == 1


def test_assign_no_gt_all_negative():
    gt = np.zeros((5, 7), np.float32)
    out = _assign(gt, np.zeros(5, bool), np.zeros(5, np.int32))
    assert np.asarray(out.pos_equal_one).sum() == 0
    assert np.all(np.asarray(out.neg_equal_one) == 1)


def test_forced_positive_far_gt():
    # tiny displaced gt whose best anchor IoU < pos_threshold still gets one
    # forced positive anchor
    gt = np.zeros((5, 7), np.float32)
    gt[0] = [0.1, 0.15, -1.0, 1.56, 1.6, 3.9, 0.3]
    mask = np.zeros(5, bool)
    mask[0] = True
    out = _assign(gt, mask, np.ones(5, np.int32))
    assert np.asarray(out.pos_equal_one).sum() >= 1


def test_encode_decode_roundtrip(rng):
    anchors = jnp.asarray(
        np.stack(
            [
                rng.uniform(-5, 5, 32),
                rng.uniform(-3, 3, 32),
                np.full(32, -1.0),
                np.full(32, 1.56),
                np.full(32, 1.6),
                np.full(32, 3.9),
                rng.choice([0, np.pi / 2], 32),
            ],
            axis=-1,
        ).astype(np.float32)
    )
    gt = jnp.asarray(
        np.stack(
            [
                rng.uniform(-5, 5, 32),
                rng.uniform(-3, 3, 32),
                rng.uniform(-2, 0, 32),
                rng.uniform(1, 2, 32),
                rng.uniform(1, 2, 32),
                rng.uniform(3, 5, 32),
                rng.uniform(-np.pi, np.pi, 32),
            ],
            axis=-1,
        ).astype(np.float32)
    )
    deltas = encode_boxes(gt, anchors)
    back = decode_boxes(deltas, anchors)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gt), atol=1e-3)


def test_reference_label_semantics_first_gt_wins():
    # two identical gt boxes on one anchor: chosen gt must be index 0
    g = _grid()
    gt = np.zeros((5, 7), np.float32)
    gt[0] = g[4, 8, 0]
    gt[1] = g[4, 8, 0]
    gt[1][0] += 0.05  # slightly different, still above threshold
    mask = np.zeros(5, bool)
    mask[:2] = True
    cls = np.array([2, 5, 0, 0, 0], np.int32)
    out = _assign(gt, mask, cls)
    assert np.asarray(out.cls_labels)[4, 8, 0] == 2
