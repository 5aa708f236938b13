"""Label-pipeline round-trip check: GT label map -> postprocessor -> boxes.

Twin of the reference's ``opencood/tools/debug_utils.py`` (:29-69), which
feeds the dataset's OWN label map (``label_dict['label_map']``) into the
postprocessor as if it were model output and visualizes the decoded boxes —
a sanity check that label generation and decode are exact inverses.

This version goes further than a visual check: it decodes the
``assign_targets`` label map through ``decode_detections`` and asserts the
recovered boxes match the ground truth (prints the worst corner error and
AP@0.7, which must be ~1.0 for a healthy pipeline), then renders the BEV
overlay like the reference.

  python -m airv2x_tpu.tools.debug_utils --hypes_yaml <cfg> [--out vis.png]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="label pipeline round trip")
    p.add_argument("--hypes_yaml", default="")
    p.add_argument("--model_dir", default="",
                   help="read config.yaml from a run dir instead")
    p.add_argument("--num_scenes", type=int, default=4)
    p.add_argument("--out", default="", help="BEV overlay png path")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    opt = parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from airv2x_tpu.config import load_yaml
    from airv2x_tpu.data.postprocess import decode_detections
    from airv2x_tpu.data.synthetic import make_scene
    from airv2x_tpu.eval.ap import (
        accumulate_tp_fp,
        eval_final_results,
        new_result_stat,
    )
    from airv2x_tpu.models.base import SlotLayout
    from airv2x_tpu.ops import geometry as geo
    from airv2x_tpu.ops.anchors import (
        anchor_standup_boxes,
        assign_targets,
        generate_anchor_grid,
    )
    from airv2x_tpu.visualization.bev_canvas import visualize

    hypes = load_yaml(opt.hypes_yaml or None, opt.model_dir or None)
    layout = SlotLayout.from_args(hypes["model"]["args"])
    anchors_np = generate_anchor_grid(hypes["postprocess"]["anchor_args"])
    anchors = jnp.asarray(anchors_np)
    standup = jnp.asarray(anchor_standup_boxes(anchors_np))
    lidar_range = hypes["preprocess"]["cav_lidar_range"]
    tgt = hypes["postprocess"]["target_args"]

    rng = np.random.default_rng(opt.seed)
    stat = new_result_stat()
    worst = 0.0
    last = None
    for _ in range(opt.num_scenes):
        scene, gt = make_scene(
            rng, layout,
            points_per_agent=2048,
            lidar_range=lidar_range,
        )
        t = assign_targets(
            jnp.asarray(gt["boxes"]),
            jnp.asarray(gt["mask"]),
            jnp.asarray(gt["classes"], jnp.int32),
            anchors, standup,
            pos_threshold=float(tgt["pos_threshold"]),
            neg_threshold=float(tgt["neg_threshold"]),
        )
        # label map AS model output (reference debug_utils.py:60-64): the
        # {0,1} pos map becomes a +-10 logit so sigmoid lands at ~1/0, and
        # the regression targets are the exact deltas. A tiny per-anchor
        # ramp breaks score ties: equal-score duplicates of the same gt are
        # otherwise both kept by NMS (suppression needs a strictly higher
        # score), which would read as false positives here.
        ramp = jnp.arange(
            t.pos_equal_one.size, dtype=jnp.float32
        ).reshape(t.pos_equal_one.shape) * 1e-6
        obj_logits = t.pos_equal_one * 20.0 - 10.0 - ramp
        det = decode_detections(
            obj_logits,  # psm: binary family reads psm as the score
            t.targets,
            obj_logits,
            anchors,
            jnp.eye(4),
            jnp.asarray(lidar_range, jnp.float32),
            num_class=1,
            obj_threshold=0.5,
            nms_thresh=float(hypes["postprocess"]["nms_thresh"]),
            top_k=int(hypes["postprocess"].get("nms_top_k", 512)),
        )
        keep = np.asarray(det.mask)
        det_c = np.asarray(det.corners)[keep]
        det_s = np.asarray(det.scores)[keep]
        gt_boxes = gt["boxes"][gt["mask"]]
        gt_c = np.asarray(
            geo.boxes_to_corners_3d(jnp.asarray(gt_boxes), order="hwl")
        )
        # Score only *decodable* gts: a pair of gts overlapping above the
        # NMS threshold can never both survive decode (the synthetic scene
        # samples box centers independently), and gts the decode-side range
        # filter would drop are not recoverable either.
        from airv2x_tpu.ops.rotated_iou import pairwise_quad_iou

        giou = np.array(
            pairwise_quad_iou(
                jnp.asarray(gt_c[:, :4, :2]), jnp.asarray(gt_c[:, :4, :2])
            )
        )
        np.fill_diagonal(giou, 0.0)
        separate = giou.max(axis=1) <= float(hypes["postprocess"]["nms_thresh"])
        in_range = np.asarray(
            geo.mask_boxes_in_range_bev(
                jnp.asarray(gt_c), jnp.asarray(lidar_range, jnp.float32)
            )
        )
        decodable = separate & in_range
        dropped = gt_c[~decodable]
        gt_c = gt_c[decodable]
        if len(dropped) and len(det_c):
            # detections of dropped gts would read as false positives
            diou = np.asarray(
                pairwise_quad_iou(
                    jnp.asarray(det_c[:, :4, :2]),
                    jnp.asarray(dropped[:, :4, :2]),
                )
            )
            det_keep = diou.max(axis=1) < 0.3
            det_c, det_s = det_c[det_keep], det_s[det_keep]
        for thr in (0.3, 0.5, 0.7):
            accumulate_tp_fp(det_c[:, :4, :2], det_s, gt_c[:, :4, :2],
                             stat, thr)
        # worst decoded-corner error against the nearest gt box
        if det_c.size and gt_c.size:
            d = np.linalg.norm(
                det_c[:, None, :4, :2] - gt_c[None, :, :4, :2], axis=-1
            ).mean(-1)
            worst = max(worst, float(d.min(axis=1).max()))
        last = (det_c, gt_c, scene)

    res = eval_final_results(stat)
    print(
        f"label-map round trip: AP@0.3/0.5/0.7 = "
        f"{res['ap_30']:.3f}/{res['ap_50']:.3f}/{res['ap_70']:.3f}, "
        f"worst mean-corner error {worst:.4f} m"
    )
    if res["ap_70"] < 0.99:
        raise SystemExit("label pipeline round trip FAILED (AP@0.7 < 0.99)")

    if opt.out and last is not None:
        det_c, gt_c, scene = last
        pts = scene["points"][scene["points_mask"]].reshape(-1, 4)
        visualize(det_c, gt_c, pts, lidar_range, save_path=opt.out)
        print(f"wrote {opt.out}")


if __name__ == "__main__":
    main()
