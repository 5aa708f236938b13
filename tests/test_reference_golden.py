"""Golden-output parity against the reference's OWN post-processing code.

Unlike the parity twins elsewhere (which compare against independently
written host implementations), these tests execute the reference's actual
label-generation / decode / NMS / AP code (torch + numpy, with real minimal
backends for its two native deps — see tests/reference_stubs.py) and assert
our ops reproduce the outputs bit-for-bit (labels, NMS keeps, TP/FP lists)
or to float tolerance (decoded boxes).

Reference anchors: data_utils/post_processor/voxel_postprocessor.py
(generate_anchor_box :33-86, generate_label_airv2x :217-355,
delta_to_boxes3d :585-636), utils/box_utils.nms_rotated :823-868,
utils/eval_utils_airv2x.caluclate_tp_fp/calculate_ap :45-159.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.reference_stubs import install_reference_stubs  # noqa: E402

install_reference_stubs()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow

jax.config.update("jax_default_matmul_precision", "highest")

ANCHOR_PARAMS = {
    "anchor_args": {
        "cav_lidar_range": [-16.0, -8.0, -3.0, 16.0, 8.0, 1.0],
        "l": 3.9,
        "w": 1.6,
        "h": 1.56,
        "r": [0, 90],
        "W": 80,
        "H": 40,
        "vw": 0.4,
        "vh": 0.4,
        "vd": 4,
        "num": 2,
        "feature_stride": 2,
    },
    "target_args": {
        "pos_threshold": 0.6,
        "neg_threshold": 0.45,
        "score_threshold": 0.2,
        "obj_threshold": 0.2,
    },
    "order": "hwl",
    "max_num": 30,
    "nms_thresh": 0.15,
    "ego_type": "vehicle",
}


@pytest.fixture(scope="module")
def ref_postprocessor():
    from opencood.data_utils.post_processor.voxel_postprocessor import (
        VoxelPostprocessor,
    )

    return VoxelPostprocessor(ANCHOR_PARAMS, dataset=None, train=True)


def _random_boxes(rng, n, lidar_range):
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0] = rng.uniform(lidar_range[0] + 3, lidar_range[3] - 3, n)
    boxes[:, 1] = rng.uniform(lidar_range[1] + 2, lidar_range[4] - 2, n)
    boxes[:, 2] = rng.uniform(-1.5, 0.0, n)
    boxes[:, 3] = rng.uniform(1.2, 2.0, n)  # h
    boxes[:, 4] = rng.uniform(1.4, 2.2, n)  # w
    boxes[:, 5] = rng.uniform(3.0, 5.0, n)  # l
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


def test_anchor_grid_golden(ref_postprocessor):
    from airv2x_tpu.ops.anchors import generate_anchor_grid

    ref = ref_postprocessor.generate_anchor_box()  # (H/s, W/s, A, 7)
    mine = generate_anchor_grid(ANCHOR_PARAMS["anchor_args"])
    assert mine.shape == ref.shape
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def _tie_artifact_mask(iou64, pos_thr, tol=1e-5):
    """Anchors whose pos/neg status is decided by a float-boundary tie.

    The reference computes IoU in float64 (the Cython kernel's DTYPE_t is
    double); the device path is float32. At anchors whose IoU exactly ties
    another anchor for a gt's argmax, or sits within float error of the
    positive threshold, the two precisions may legitimately disagree —
    every other anchor must match bit-for-bit.
    """
    best_per_gt = iou64.max(axis=0, keepdims=True)  # (1, G)
    near_best = np.abs(iou64 - best_per_gt) < tol
    near_thr = np.abs(iou64 - pos_thr) < tol
    return ((near_best | near_thr) & (iou64 > 0)).any(axis=1)  # (Na,)


def test_label_gen_golden(ref_postprocessor, rng):
    """Reference generate_label_airv2x (real control flow, numpy
    bbox_overlaps backend) vs the on-device assign_targets — bit-for-bit on
    pos/neg maps and class labels away from float-boundary ties, float
    tolerance on regression targets."""
    from tests.reference_stubs import bbox_overlaps_np

    from airv2x_tpu.ops import geometry as geo
    from airv2x_tpu.ops.anchors import (
        anchor_standup_boxes,
        assign_targets,
        generate_anchor_grid,
    )

    lr = ANCHOR_PARAMS["anchor_args"]["cav_lidar_range"]
    anchors = generate_anchor_grid(ANCHOR_PARAMS["anchor_args"])
    standup = anchor_standup_boxes(anchors)

    max_num = ANCHOR_PARAMS["max_num"]
    for seed in range(3):
        srng = np.random.default_rng(seed)
        n = int(srng.integers(1, 9))
        gt = np.zeros((max_num, 7), np.float32)
        gt[:n] = _random_boxes(srng, n, lr)
        mask = np.zeros((max_num,), np.float32)
        mask[:n] = 1
        class_ids = np.zeros((max_num,), np.int64)
        class_ids[:n] = srng.integers(1, 7, n)

        ref = ref_postprocessor.generate_label_airv2x(
            gt_box_center=gt,
            anchors=anchors,
            mask=mask,
            class_ids_padded=class_ids,
        )
        mine = assign_targets(
            jnp.asarray(gt),
            jnp.asarray(mask, bool),
            jnp.asarray(class_ids, jnp.int32),
            jnp.asarray(anchors),
            jnp.asarray(standup),
            pos_threshold=ANCHOR_PARAMS["target_args"]["pos_threshold"],
            neg_threshold=ANCHOR_PARAMS["target_args"]["neg_threshold"],
        )

        # float64 IoU identifies boundary-tie anchors excluded from the
        # bit-for-bit comparison (fp32 device path vs fp64 reference)
        gt_standup = np.asarray(
            geo.corners_to_standup_2d(
                geo.boxes_to_corners_bev(jnp.asarray(gt[:n]), order="hwl")
            )
        )
        iou64 = bbox_overlaps_np(standup, gt_standup)
        tie = _tie_artifact_mask(
            iou64, ANCHOR_PARAMS["target_args"]["pos_threshold"]
        ).reshape(mine.pos_equal_one.shape)
        ok = ~tie
        assert tie.mean() < 0.02, "tie-artifact mask suspiciously large"

        np.testing.assert_array_equal(
            np.asarray(mine.pos_equal_one)[ok],
            ref["pos_equal_one"][ok],
            err_msg=f"pos map diverges (seed {seed})",
        )
        np.testing.assert_array_equal(
            np.asarray(mine.neg_equal_one)[ok],
            ref["neg_equal_one"][ok],
            err_msg=f"neg map diverges (seed {seed})",
        )
        ok7 = np.repeat(ok.reshape(*ok.shape[:2], -1), 7, axis=-1)
        np.testing.assert_allclose(
            np.asarray(mine.targets)[ok7], ref["targets"][ok7], atol=1e-4,
            err_msg=f"regression targets diverge (seed {seed})",
        )
        # reference class label map: positives carry the gt class id
        np.testing.assert_array_equal(
            np.asarray(mine.cls_labels)[ok],
            np.asarray(ref["cls_labels"])[ok],
            err_msg=f"class labels diverge (seed {seed})",
        )


def test_delta_decode_golden(ref_postprocessor, rng):
    """delta_to_boxes3d (reference torch) vs decode_boxes."""
    from airv2x_tpu.ops.anchors import generate_anchor_grid
    from airv2x_tpu.ops.boxes import decode_boxes

    anchors = generate_anchor_grid(ANCHOR_PARAMS["anchor_args"])
    h, w, a, _ = anchors.shape
    deltas = rng.normal(0, 0.3, (1, h, w, a * 7)).astype(np.float32)

    ref = ref_postprocessor.delta_to_boxes3d(
        torch.tensor(deltas).permute(0, 3, 1, 2),  # (B, A*7, H, W)
        torch.tensor(anchors),
    ).numpy()[0]  # (H*W*A, 7)

    mine = decode_boxes(
        jnp.asarray(deltas.reshape(h, w, a, 7)).reshape(-1, 7),
        jnp.asarray(anchors.reshape(-1, 7)),
    )
    np.testing.assert_allclose(np.asarray(mine), ref, atol=2e-4)


def test_nms_rotated_golden(rng):
    """Reference greedy shapely NMS (real polygon backend) vs device NMS:
    identical keep sets."""
    from opencood.utils import box_utils

    from airv2x_tpu.ops import geometry as geo
    from airv2x_tpu.ops.nms import rotated_nms

    n = 48
    lr = ANCHOR_PARAMS["anchor_args"]["cav_lidar_range"]
    for seed in range(3):
        srng = np.random.default_rng(100 + seed)
        boxes = _random_boxes(srng, n, lr)
        # clusters of overlapping boxes to exercise suppression
        boxes[n // 2:, :2] = boxes[: n - n // 2, :2] + srng.normal(
            0, 0.8, (n - n // 2, 2)
        )
        scores = srng.uniform(0.05, 1.0, n).astype(np.float32)

        corners = np.asarray(
            geo.boxes_to_corners_bev(jnp.asarray(boxes), order="hwl")
        )
        keep_ref = box_utils.nms_rotated(
            torch.tensor(corners), torch.tensor(scores),
            ANCHOR_PARAMS["nms_thresh"],
        )
        keep_mask = rotated_nms(
            jnp.asarray(corners),
            jnp.asarray(scores),
            jnp.ones((n,), bool),
            ANCHOR_PARAMS["nms_thresh"],
        )
        mine = set(np.nonzero(np.asarray(keep_mask))[0].tolist())
        assert mine == set(np.asarray(keep_ref).tolist()), (
            f"NMS keep sets diverge (seed {seed})"
        )


def test_tp_fp_ap_golden(rng):
    """caluclate_tp_fp + calculate_ap (reference, real polygon backend) vs
    eval/ap.py on the same detections: identical tp/fp lists and AP."""
    from opencood.utils import eval_utils_airv2x as ref_eval

    from airv2x_tpu.eval.ap import accumulate_tp_fp, calculate_ap, new_result_stat
    from airv2x_tpu.ops import geometry as geo

    lr = ANCHOR_PARAMS["anchor_args"]["cav_lidar_range"]
    ref_stat = {
        0.5: {"tp": [], "fp": [], "score": [], "gt": 0},
        0.7: {"tp": [], "fp": [], "score": [], "gt": 0},
    }
    my_stat = new_result_stat()
    for seed in range(4):
        srng = np.random.default_rng(200 + seed)
        n_gt = int(srng.integers(2, 8))
        gt = _random_boxes(srng, n_gt, lr)
        n_det = int(srng.integers(3, 12))
        det = gt[srng.integers(0, n_gt, n_det)].copy()
        det[:, :2] += srng.normal(0, 0.6, (n_det, 2))
        det[:, 6] += srng.normal(0, 0.15, n_det)
        scores = srng.uniform(0.1, 1.0, n_det).astype(np.float32)

        det_c = np.asarray(geo.boxes_to_corners_bev(jnp.asarray(det), "hwl"))
        gt_c = np.asarray(geo.boxes_to_corners_bev(jnp.asarray(gt), "hwl"))

        for t in (0.5, 0.7):
            ref_eval.caluclate_tp_fp(
                torch.tensor(det_c), torch.tensor(scores),
                torch.tensor(gt_c), ref_stat, t,
            )
            accumulate_tp_fp(det_c, scores, gt_c, my_stat, t)

    for t in (0.5, 0.7):
        assert my_stat[t]["gt"] == ref_stat[t]["gt"]
        assert my_stat[t]["tp"] == list(ref_stat[t]["tp"]), f"tp diverge @{t}"
        assert my_stat[t]["fp"] == list(ref_stat[t]["fp"]), f"fp diverge @{t}"
        ap_ref = ref_eval.calculate_ap(ref_stat, t, global_sort_detections=True)
        ap_mine = calculate_ap(my_stat, t, global_sort_detections=True)
        if isinstance(ap_ref, tuple):
            ap_ref = ap_ref[0]
        assert abs(ap_mine - ap_ref) < 1e-9, f"AP diverges @{t}"


def test_postprocess_pipeline_parity(ref_postprocessor, rng):
    """Full postprocess pipeline on identical raw head outputs: reference
    post_process_airv2x (sigmoid gate -> delta decode -> project -> large/z
    filters -> rotated NMS -> range mask) vs decode_detections — identical
    surviving boxes and scores, and identical single-class AP against a gt
    set.

    Class labels are intentionally NOT compared: the reference trains psm
    in anchor-major channel layout (loss/point_pillar_loss_multiclass.py
    :110,200 views (B,H,W,A,C)) but its decode reads it class-major
    (voxel_postprocessor.py:714 views (B,C,A,H,W)) — an upstream
    inconsistency that scrambles decode-time labels. Our decode keeps the
    training-consistent anchor-major layout.
    """
    from airv2x_tpu.data.postprocess import decode_detections
    from airv2x_tpu.eval.ap import (
        accumulate_tp_fp,
        calculate_ap,
        new_result_stat,
    )
    from airv2x_tpu.ops import geometry as geo
    from airv2x_tpu.ops.anchors import generate_anchor_grid

    anchors = generate_anchor_grid(ANCHOR_PARAMS["anchor_args"])
    h, w, a, _ = anchors.shape
    num_class = 7
    lr = ANCHOR_PARAMS["anchor_args"]["cav_lidar_range"]

    srng = np.random.default_rng(42)
    psm = srng.normal(-1, 1, (h, w, a * num_class)).astype(np.float32)
    rm = srng.normal(0, 0.2, (h, w, a * 7)).astype(np.float32)
    obj = srng.normal(-2.2, 1.2, (h, w, a)).astype(np.float32)  # sparse gate

    data_dict = {
        "ego": {
            "transformation_matrix": torch.eye(4),
            "anchor_box": torch.tensor(anchors),
        }
    }
    output_dict = {
        "ego": {
            "psm": torch.tensor(psm.transpose(2, 0, 1))[None],
            "rm": torch.tensor(rm.transpose(2, 0, 1))[None],
            "obj": torch.tensor(obj.transpose(2, 0, 1))[None],
        }
    }
    ref_corners, ref_scores, ref_labels, ref_boxes = (
        ref_postprocessor.post_process_airv2x(data_dict, output_dict)
    )

    det = decode_detections(
        jnp.asarray(psm),
        jnp.asarray(rm),
        jnp.asarray(obj),
        jnp.asarray(anchors),
        jnp.eye(4),
        jnp.asarray(lr, jnp.float32),
        num_class=num_class,
        obj_threshold=ANCHOR_PARAMS["target_args"]["obj_threshold"],
        nms_thresh=ANCHOR_PARAMS["nms_thresh"],
        top_k=1024,
    )
    keep = np.asarray(det.mask)
    my_scores = np.sort(np.asarray(det.scores)[keep])
    ref_s = np.sort(ref_scores.numpy())
    assert len(my_scores) == len(ref_s), (
        f"kept {len(my_scores)} vs reference {len(ref_s)}"
    )
    np.testing.assert_allclose(my_scores, ref_s, atol=1e-5)

    # identical single-class AP on a synthetic gt set
    gt = _random_boxes(np.random.default_rng(7), 6, lr)
    gt_c = np.asarray(geo.boxes_to_corners_bev(jnp.asarray(gt), "hwl"))

    my_stat = new_result_stat()
    ref_stat = new_result_stat()
    order_mine = np.argsort(-np.asarray(det.scores)[keep])
    my_corners = np.asarray(det.corners)[keep][:, :4, :2]
    for t in (0.3, 0.5, 0.7):
        accumulate_tp_fp(
            my_corners, np.asarray(det.scores)[keep], gt_c, my_stat, t
        )
        accumulate_tp_fp(
            ref_corners.numpy()[:, :4, :2], ref_scores.numpy(), gt_c,
            ref_stat, t,
        )
        assert abs(
            calculate_ap(my_stat, t) - calculate_ap(ref_stat, t)
        ) < 1e-9, f"AP diverges @{t}"


def test_pose_math_golden(rng):
    """x_to_world / x1_to_x2 (reference pure-numpy pose math, the frame
    conversion every dataset path relies on) vs utils.transforms."""
    from opencood.utils.transformation_utils import x1_to_x2, x_to_world

    from airv2x_tpu.utils import transforms as tf

    for seed in range(5):
        srng = np.random.default_rng(300 + seed)
        p1 = [
            *srng.uniform(-50, 50, 3),
            *srng.uniform(-180, 180, 3),  # roll, yaw, pitch (degrees)
        ]
        p2 = [*srng.uniform(-50, 50, 3), *srng.uniform(-180, 180, 3)]
        np.testing.assert_allclose(
            tf.pose_to_world(p1), x_to_world(p1), atol=1e-9,
            err_msg=f"x_to_world diverges (seed {seed})",
        )
        np.testing.assert_allclose(
            tf.pose_a_to_b(p1, p2), x1_to_x2(p1, p2), atol=1e-9,
            err_msg=f"x1_to_x2 diverges (seed {seed})",
        )


def test_box_corner_golden(rng):
    """boxes_to_corners_3d (reference torch, hwl order) vs ops.geometry."""
    from opencood.utils import box_utils

    from airv2x_tpu.ops import geometry as geo

    lr = ANCHOR_PARAMS["anchor_args"]["cav_lidar_range"]
    boxes = _random_boxes(np.random.default_rng(400), 12, lr)
    ref = box_utils.boxes_to_corners_3d(boxes, order="hwl")
    if hasattr(ref, "numpy"):
        ref = ref.numpy()
    mine = np.asarray(geo.boxes_to_corners_3d(jnp.asarray(boxes), order="hwl"))
    np.testing.assert_allclose(mine, ref, atol=1e-4)


def test_pairwise_warp_golden(rng):
    """normalize_pairwise_tfm + warp_affine_simple (reference torch) vs
    ops.warp normalized_pairwise_affine + warp_affine_normalized — the BEV
    neighbor-to-ego warp convention every intermediate fusion relies on."""
    import torch

    from opencood.models.sub_modules.torch_transformation_utils import (
        warp_affine_simple,
    )
    from opencood.utils.transformation_utils import normalize_pairwise_tfm

    import jax.numpy as jnp

    from airv2x_tpu.ops.warp import (
        normalized_pairwise_affine,
        warp_affine_normalized,
    )

    h, w, c = 24, 48, 6
    discrete_ratio, downsample = 0.4, 2

    # random planar rigid transform per (ego, sender) pair
    ang = rng.uniform(-np.pi / 3, np.pi / 3)
    tx, ty = rng.uniform(-4, 4, 2)
    t = np.eye(4, dtype=np.float64)
    t[0, 0] = t[1, 1] = np.cos(ang)
    t[0, 1], t[1, 0] = -np.sin(ang), np.sin(ang)
    t[0, 3], t[1, 3] = tx, ty
    pairwise = np.broadcast_to(t, (1, 2, 2, 4, 4)).copy()

    feat = rng.normal(size=(1, c, h, w)).astype(np.float32)

    t_norm = normalize_pairwise_tfm(
        torch.from_numpy(pairwise.astype(np.float32)), h, w,
        discrete_ratio, downsample,
    )
    with torch.no_grad():
        want = (
            warp_affine_simple(
                torch.from_numpy(feat), t_norm[0, 0, 1][None], (h, w)
            )
            .numpy()
            .transpose(0, 2, 3, 1)
        )

    aff = normalized_pairwise_affine(
        jnp.asarray(pairwise, jnp.float32)[0, 0, 1],
        h, w, discrete_ratio, downsample,
    )
    got = np.asarray(
        warp_affine_normalized(
            jnp.asarray(feat.transpose(0, 2, 3, 1)), aff[None]
        )
    )
    assert np.abs(got - want).max() < 2e-4, (
        f"warp mismatch {np.abs(got - want).max()}"
    )


def test_seg_metrics_golden(rng):
    """eval/seg_metrics.evaluate_segmentation vs the reference's own
    evaluator (eval_utils_airv2x.py:447+) on random probability maps."""
    from opencood.utils import eval_utils_airv2x as ref_eval

    from airv2x_tpu.eval.seg_metrics import evaluate_segmentation

    b, h, w, cd, cs = 2, 16, 20, 8, 3
    gt_d = rng.integers(0, cd, (b, h, w))
    gt_s = rng.integers(0, cs, (b, h, w))
    pr_d = rng.uniform(0, 1, (b, cd, h, w))
    pr_s = rng.uniform(0, 1, (b, cs, h, w))

    want = ref_eval.evaluate_segmentation(gt_d, pr_d, gt_s, pr_s)
    got = evaluate_segmentation(
        gt_d, pr_d.transpose(0, 2, 3, 1), gt_s, pr_s.transpose(0, 2, 3, 1)
    )
    for branch in ("dynamic", "static"):
        w_m, g_m = want[branch], got[branch]
        for key in ("mean_iou", "mean_dice", "pixel_accuracy"):
            assert abs(float(g_m[key]) - float(w_m[key])) < 1e-9, (
                branch, key, g_m[key], w_m[key]
            )
        np.testing.assert_allclose(
            np.asarray(g_m["iou_per_class"], float),
            np.asarray(w_m["iou_per_class"], float),
            atol=1e-9, err_msg=branch,
        )


def test_multiclass_map_golden(rng):
    """calculate_multiclass_tp_fp + compute_multiclass_ap_map (reference)
    vs eval/ap.py multiclass path, incl. the det-only-class AP=0 rule."""
    from opencood.utils import eval_utils_airv2x as ref_eval

    from airv2x_tpu.eval.ap import (
        accumulate_multiclass,
        eval_multiclass_results,
        new_multiclass_stat,
    )
    from airv2x_tpu.ops import geometry as geo

    lr = ANCHOR_PARAMS["anchor_args"]["cav_lidar_range"]
    num_classes = 4
    # pre-initialize the reference buckets: its own lazy init double-counts
    # the first sample's gt per class (calculate_multiclass_tp_fp:257-263
    # seeds gt=len(...) and caluclate_tp_fp adds the same gts again) — an
    # upstream bug we do not reproduce (eval/ap.py accumulate_multiclass)
    ref_stat = {
        c: {t: {"tp": [], "fp": [], "score": [], "gt": 0}
            for t in (0.3, 0.5, 0.7)}
        for c in range(1, num_classes + 1)
    }
    my_stat = new_multiclass_stat(num_classes)
    for seed in range(4):
        srng = np.random.default_rng(600 + seed)
        n_gt = int(srng.integers(3, 9))
        gt = _random_boxes(srng, n_gt, lr)
        gt_labels = srng.integers(1, num_classes, n_gt)  # class 4 never in gt
        n_det = int(srng.integers(4, 12))
        det = gt[srng.integers(0, n_gt, n_det)].copy()
        det[:, :2] += srng.normal(0, 0.6, (n_det, 2))
        scores = srng.uniform(0.1, 1.0, n_det).astype(np.float32)
        det_labels = srng.integers(1, num_classes + 1, n_det)  # incl. 4

        det_c = np.asarray(geo.boxes_to_corners_bev(jnp.asarray(det), "hwl"))
        gt_c = np.asarray(geo.boxes_to_corners_bev(jnp.asarray(gt), "hwl"))

        for t in (0.3, 0.5, 0.7):
            ref_eval.calculate_multiclass_tp_fp(
                torch.tensor(det_c), torch.tensor(scores),
                torch.tensor(det_labels), torch.tensor(gt_c),
                gt_labels.tolist(), t, ref_stat,
            )
        accumulate_multiclass(
            det_c, scores, det_labels, gt_c, gt_labels, my_stat
        )

    res = eval_multiclass_results(my_stat)
    for t in (0.3, 0.5, 0.7):
        ap_ref, map_ref = ref_eval.compute_multiclass_ap_map(
            ref_stat, iou_thresh=t, global_sort_detections=True
        )
        assert abs(res[f"map_{int(t * 100)}"] - map_ref) < 1e-9, (
            t, res[f"map_{int(t * 100)}"], map_ref
        )
        for c, ap in ap_ref.items():
            mine = res["per_class"].get(c, {}).get(f"ap_{int(t * 100)}", 0.0)
            assert abs(mine - ap) < 1e-9, (t, c, mine, ap)
