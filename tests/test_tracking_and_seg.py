import numpy as np

from airv2x_tpu.eval.seg_metrics import evaluate_branch, evaluate_segmentation
from airv2x_tpu.models.tracking import Tracker


def _unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


def test_tracker_maintains_ids():
    tr = Tracker(sim_threshold=0.5)
    e1 = np.stack([_unit([1, 0, 0]), _unit([0, 1, 0])])
    boxes = np.zeros((2, 5))
    ids_t0 = tr.update(boxes, e1)
    assert len(set(ids_t0)) == 2

    # same embeddings next frame -> same ids
    ids_t1 = tr.update(boxes, e1)
    assert ids_t1 == ids_t0

    # a new orthogonal detection gets a fresh id
    e2 = np.stack([_unit([1, 0, 0]), _unit([0, 0, 1])])
    ids_t2 = tr.update(boxes, e2)
    assert ids_t2[0] == ids_t0[0]
    assert ids_t2[1] not in ids_t0


def test_tracker_ages_out():
    tr = Tracker(sim_threshold=0.5, max_age=1)
    e1 = np.stack([_unit([1, 0, 0])])
    ids = tr.update(np.zeros((1, 5)), e1)
    # two frames with a non-matching detection -> original track expires
    e2 = np.stack([_unit([0, 1, 0])])
    tr.update(np.zeros((1, 5)), e2)
    tr.update(np.zeros((1, 5)), e2)
    track_ids = [t["id"] for t in tr.tracks]
    assert ids[0] not in track_ids


def test_seg_branch_perfect():
    gt = np.array([[0, 1], [2, 1]])
    res = evaluate_branch(gt, gt.copy(), num_classes=3)
    assert res["mean_iou"] == 1.0
    assert res["pixel_accuracy"] == 1.0


def test_seg_branch_partial():
    gt = np.array([[0, 1], [1, 1]])
    pred = np.array([[0, 1], [0, 1]])
    res = evaluate_branch(gt, pred, num_classes=2)
    # class0: inter 1 union 2 -> 0.5; class1: inter 2 union 3 -> 2/3
    np.testing.assert_allclose(res["iou_per_class"], [0.5, 2 / 3])
    assert res["pixel_accuracy"] == 0.75


def test_evaluate_segmentation_end_to_end():
    h = w = 8
    gt_dyn = np.zeros((1, h, w), np.int32)
    gt_dyn[0, :4] = 2
    probs_dyn = np.zeros((1, h, w, 7), np.float32)
    probs_dyn[0, :4, :, 1] = 0.9  # class index 1 -> label 2
    gt_sta = np.zeros((1, h, w), np.int32)
    probs_sta = np.zeros((1, h, w, 3), np.float32)
    res = evaluate_segmentation(gt_dyn, probs_dyn, gt_sta, probs_sta)
    assert res["dynamic"]["pixel_accuracy"] == 1.0
    assert res["static"]["pixel_accuracy"] == 1.0
    assert 0.0 <= res["combined"]["mean_iou"] <= 1.0
