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
