"""VOC-style detection AP evaluation (host harness).

Protocol twin of utils/eval_utils_airv2x.py:19-196: greedy score-descending
matching of predicted vs gt BEV polygons at IoU {0.3, 0.5, 0.7}, VOC-2010
interpolated AP. Polygon IoU comes from the same XLA kernel the device NMS
uses (ops.rotated_iou) instead of shapely, so eval and inference share one
geometry definition.
"""

from __future__ import annotations

import numpy as np

from airv2x_tpu.ops.rotated_iou import rotated_iou_matrix_np

IOU_THRESHOLDS = (0.3, 0.5, 0.7)


def new_result_stat():
    return {t: {"tp": [], "fp": [], "score": [], "gt": 0} for t in IOU_THRESHOLDS}


def accumulate_tp_fp(det_corners, det_scores, gt_corners, result_stat, iou_thresh):
    """det_corners (N, 4, 2) BEV quads, det_scores (N,), gt_corners (M, 4, 2)."""
    stat = result_stat[iou_thresh]
    stat["gt"] += int(gt_corners.shape[0])
    if det_corners is None or det_corners.shape[0] == 0:
        return

    order = np.argsort(-det_scores)
    det_corners = det_corners[order]
    det_scores = det_scores[order]

    iou = rotated_iou_matrix_np(det_corners, gt_corners)  # (N, M)
    gt_alive = np.ones(gt_corners.shape[0], dtype=bool)
    tp, fp = [], []
    for i in range(det_corners.shape[0]):
        ious = np.where(gt_alive, iou[i], 0.0)
        if gt_alive.any() and ious.max() >= iou_thresh:
            j = int(np.argmax(ious))
            gt_alive[j] = False
            tp.append(1)
            fp.append(0)
        else:
            tp.append(0)
            fp.append(1)
    stat["tp"] += tp
    stat["fp"] += fp
    stat["score"] += det_scores.tolist()


def voc_ap(rec, prec):
    """VOC-2010 interpolated AP (eval_utils_airv2x.py:19-42)."""
    mrec = [0.0] + list(rec) + [1.0]
    mpre = [0.0] + list(prec) + [0.0]
    for i in range(len(mpre) - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    ap = 0.0
    for i in range(1, len(mrec)):
        if mrec[i] != mrec[i - 1]:
            ap += (mrec[i] - mrec[i - 1]) * mpre[i]
    return ap


def calculate_ap(result_stat, iou_thresh, global_sort_detections: bool = True):
    stat = result_stat[iou_thresh]
    fp, tp, score = (
        np.array(stat["fp"]),
        np.array(stat["tp"]),
        np.array(stat["score"]),
    )
    if stat["gt"] == 0 or len(tp) == 0:
        return 0.0
    if global_sort_detections:
        order = np.argsort(-score)
        fp, tp = fp[order], tp[order]
    fp_c = np.cumsum(fp)
    tp_c = np.cumsum(tp)
    rec = tp_c / stat["gt"]
    prec = tp_c / np.maximum(fp_c + tp_c, 1)
    return voc_ap(rec.tolist(), prec.tolist())


def eval_final_results(result_stat):
    return {f"ap_{int(t * 100)}": calculate_ap(result_stat, t) for t in IOU_THRESHOLDS}


# ---------------------------------------------------------------------------
# Multiclass mAP (twin of eval_utils_airv2x.py:204-426)
# ---------------------------------------------------------------------------


def new_multiclass_stat(num_classes: int):
    return {c: new_result_stat() for c in range(1, num_classes + 1)}


def accumulate_multiclass(
    det_corners, det_scores, det_labels, gt_corners, gt_labels, stat
):
    """Per-class greedy matching: detections and gts are bucketed by class
    and matched within the class (calculate_multiclass_tp_fp :204-264).

    Upstream quirk NOT reproduced: the reference initializes each class
    bucket with ``gt = len(cls_gt_indices)`` AND then lets caluclate_tp_fp
    add the same sample's gt count again (:257-263), double-counting the
    first sample's ground truth per class and deflating recall/AP. Here
    every sample's gt is counted exactly once
    (tests/test_reference_golden.py::test_multiclass_map_golden verifies
    parity against the quirk-cancelled reference)."""
    for c, class_stat in stat.items():
        dm = det_labels == c if det_corners is not None else None
        gm = gt_labels == c
        for t in IOU_THRESHOLDS:
            accumulate_tp_fp(
                det_corners[dm] if det_corners is not None else None,
                det_scores[dm] if det_scores is not None else None,
                gt_corners[gm],
                class_stat,
                t,
            )


def eval_multiclass_results(stat):
    """Per-class AP at each threshold + mAP over classes with ground truth
    (compute_multiclass_ap_map :265-321)."""
    out = {"per_class": {}}
    for t in IOU_THRESHOLDS:
        aps = []
        for c, class_stat in stat.items():
            # reference inclusion rule (calculate_multiclass_tp_fp:238 +
            # compute_multiclass_ap_map:293-310): a class participates when
            # it appears in gt OR detections; det-only classes score AP=0
            # and pull the mean down, classes absent from both are skipped
            if class_stat[t]["gt"] == 0 and not class_stat[t]["score"]:
                continue
            ap = calculate_ap(class_stat, t)
            out["per_class"].setdefault(c, {})[f"ap_{int(t * 100)}"] = ap
            aps.append(ap)
        out[f"map_{int(t * 100)}"] = float(np.mean(aps)) if aps else 0.0
    return out
