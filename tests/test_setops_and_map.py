import jax.numpy as jnp
import numpy as np

from airv2x_tpu.eval.ap import (
    accumulate_multiclass,
    eval_multiclass_results,
    new_multiclass_stat,
)
from airv2x_tpu.ops import geometry as geo
from airv2x_tpu.ops.points_in_boxes import (
    ball_query,
    farthest_point_sampling,
    points_in_rotated_boxes,
    three_nn_interpolate,
)


def test_points_in_rotated_boxes():
    boxes = jnp.array(
        [[0, 0, 0, 1.0, 2.0, 4.0, 0.0], [10, 0, 0, 1.0, 2.0, 4.0, np.pi / 2]]
    )  # hwl: h=1, w=2, l=4
    pts = jnp.array(
        [
            [0.0, 0.0, 0.0],  # center of box0
            [1.9, 0.0, 0.0],  # inside box0 (l/2=2 along x)
            [0.0, 1.5, 0.0],  # outside (w/2=1 along y)
            [10.0, 1.9, 0.0],  # inside box1 (rotated: l along y)
            [11.5, 0.0, 0.0],  # outside box1 (w/2=1 along x after rot)
        ]
    )
    m = np.asarray(points_in_rotated_boxes(pts, boxes, order="hwl"))
    assert m[:, 0].tolist() == [True, True, False, False, False]
    assert m[:, 1].tolist() == [False, False, False, True, False]


def test_fps_spreads_and_respects_mask(rng):
    pts = np.zeros((64, 3), np.float32)
    pts[:32] = rng.uniform(-10, 10, (32, 3))
    pts[32:] = 1000.0  # padding area
    mask = np.arange(64) < 32
    idx = np.asarray(farthest_point_sampling(jnp.asarray(pts), jnp.asarray(mask), 8))
    assert (idx < 32).all()
    assert len(set(idx.tolist())) == 8


def test_ball_query():
    pts = jnp.array([[0, 0, 0], [0.5, 0, 0], [5, 0, 0], [0.2, 0.2, 0]], jnp.float32)
    centers = jnp.array([[0.0, 0, 0]])
    idx, valid = ball_query(centers, pts, jnp.ones(4, bool), 1.0, 3)
    hits = set(np.asarray(idx)[0][np.asarray(valid)[0]].tolist())
    assert hits == {0, 1, 3}


def test_three_nn_interpolate():
    support = jnp.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], jnp.float32)
    feats = jnp.array([[1.0], [2.0], [3.0]])
    q = jnp.array([[0.0, 0.0, 0.0]])
    out = np.asarray(
        three_nn_interpolate(q, support, feats, jnp.ones(3, bool))
    )
    # query coincides with support 0 -> weight overwhelmingly on feature 1.0
    assert abs(out[0, 0] - 1.0) < 1e-3


def test_multiclass_map():
    stat = new_multiclass_stat(3)
    gt_boxes = jnp.array(
        [[0, 0, 0, 1.5, 1.6, 3.9, 0.0], [20, 0, 0, 1.5, 1.6, 3.9, 0.0]]
    )
    gt_c = np.asarray(geo.boxes_to_corners_bev(gt_boxes, order="hwl"))
    gt_labels = np.array([1, 2])
    # perfect detection for class 1, nothing for class 2
    det_c = gt_c[:1]
    det_s = np.array([0.9])
    det_l = np.array([1])
    accumulate_multiclass(det_c, det_s, det_l, gt_c, gt_labels, stat)
    res = eval_multiclass_results(stat)
    assert res["per_class"][1]["ap_50"] == 1.0
    assert res["per_class"][2]["ap_50"] == 0.0
    assert abs(res["map_50"] - 0.5) < 1e-9
    assert 3 not in res["per_class"]  # no gt for class 3 -> excluded
