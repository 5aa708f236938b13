"""Distance ablation evaluation (twin of tools/abl_object_dist.py +
abl_object_distance.py).

Two capabilities of the reference's ablation pair in one CLI:

  * ``--range "X,Y"`` restricts the evaluation detection range to
    [-X, X] x [-Y, Y] (abl_object_dist.py:118-156 rewrites
    cav_lidar_range the same way) — both detections and GT outside the
    restricted range are dropped before AP;
  * AP is additionally reported per ego-distance bucket (0-30 m,
    30-50 m, 50+ m by default) so the near/far degradation curve of a
    collaboration method is visible in one run.

Runs on the synthetic scene generator (same flow as tools/inference.py).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="distance-ablation eval")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--hypes_yaml", default=None)
    p.add_argument("--num_scenes", type=int, default=16)
    p.add_argument("--epoch", type=int, default=0)
    p.add_argument("--obj_threshold", type=float, default=0.0)
    p.add_argument("--range", default=None,
                   help='"X,Y": restrict eval range to [-X,X]x[-Y,Y]')
    p.add_argument("--buckets", default="0,30,50,1e9",
                   help="ego-distance bucket edges in meters")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def _center_dist(corners):
    """BEV quad centers -> ego distance."""
    c = np.asarray(corners).mean(axis=1)
    return np.linalg.norm(c[:, :2], axis=1)


def main():
    opt = parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from airv2x_tpu.config import load_yaml, save_yaml
    from airv2x_tpu.data.postprocess import decode_detections
    from airv2x_tpu.data.synthetic import make_scene
    from airv2x_tpu.eval.ap import (
        accumulate_tp_fp,
        eval_final_results,
        new_result_stat,
    )
    from airv2x_tpu.models import build_model
    from airv2x_tpu.models.base import SlotLayout
    from airv2x_tpu.ops import geometry as geo
    from airv2x_tpu.ops.anchors import generate_anchor_grid
    from airv2x_tpu.parallel.train import create_train_state, make_optimizer
    from airv2x_tpu.utils.checkpoint import find_best_epoch, load_checkpoint

    hypes = load_yaml(opt.hypes_yaml or None, opt.model_dir)
    if opt.range:
        # abl_object_dist.py:118-146: rewrite the eval detection range
        x_r, y_r = (float(v) for v in opt.range.split(","))
        old = hypes["preprocess"]["cav_lidar_range"]
        new_range = [-x_r, -y_r, old[2], x_r, y_r, old[5]]
        hypes["preprocess"]["cav_lidar_range"] = new_range
        hypes["postprocess"]["anchor_args"]["cav_lidar_range"] = new_range
        print(f"[abl] restricted eval range to {new_range}")

    model = build_model(hypes)
    layout = SlotLayout.from_args(hypes["model"]["args"])
    anchors = jnp.asarray(
        generate_anchor_grid(hypes["postprocess"]["anchor_args"])
    )
    lidar_range = jnp.asarray(
        hypes["preprocess"]["cav_lidar_range"], jnp.float32
    )
    edges = [float(v) for v in opt.buckets.split(",")]
    buckets = list(zip(edges[:-1], edges[1:]))

    rng = np.random.default_rng(opt.seed)
    scene_kw = dict(
        num_objects=8,
        points_per_agent=int(hypes["preprocess"].get("max_points", 8192)),
        lidar_range=hypes["preprocess"]["cav_lidar_range"],
    )
    scene0, _ = make_scene(rng, layout, **scene_kw)
    example = jax.tree.map(lambda x: jnp.asarray(x)[None], scene0)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)},
        example,
    )
    tx, _ = make_optimizer(hypes)
    state = create_train_state(model, variables, tx)
    epoch = opt.epoch or find_best_epoch(opt.model_dir)
    if epoch:
        state = load_checkpoint(opt.model_dir, epoch, jax.device_get(state))
        print(f"loaded epoch {epoch}")
    else:
        print("WARNING: no checkpoint found, evaluating random init")

    tgt = dict(hypes["postprocess"]["target_args"])
    if opt.obj_threshold > 0:
        tgt["obj_threshold"] = opt.obj_threshold

    @jax.jit
    def infer(params, stats, batch):
        out = model.apply(
            {"params": params, "batch_stats": stats}, batch, train=False
        )
        return decode_detections(
            out["psm"][0],
            out["rm"][0],
            out.get("obj", out["psm"])[0],
            anchors,
            jnp.eye(4),
            lidar_range,
            num_class=hypes["num_class"],
            obj_threshold=tgt["obj_threshold"],
            nms_thresh=hypes["postprocess"]["nms_thresh"],
            top_k=int(hypes["postprocess"].get("nms_top_k", 512)),
        )

    stats = {b: new_result_stat() for b in buckets}
    overall = new_result_stat()
    for _ in range(opt.num_scenes):
        scene, gt = make_scene(rng, layout, **scene_kw)
        batch = jax.tree.map(lambda x: jnp.asarray(x)[None], scene)
        det = infer(state.params, state.batch_stats, batch)

        keep = np.asarray(det.mask)
        det_corners = np.asarray(det.corners)[keep][:, :4, :2]
        det_scores = np.asarray(det.scores)[keep]
        gt_boxes = gt["boxes"][gt["mask"]]
        gt_corners = np.asarray(
            geo.boxes_to_corners_bev(jnp.asarray(gt_boxes), order="hwl")
        )
        dd = _center_dist(det_corners) if len(det_corners) else np.zeros(0)
        gd = _center_dist(gt_corners) if len(gt_corners) else np.zeros(0)
        for t in (0.3, 0.5, 0.7):
            accumulate_tp_fp(det_corners, det_scores, gt_corners, overall, t)
            for b in buckets:
                dsel = (dd >= b[0]) & (dd < b[1])
                gsel = (gd >= b[0]) & (gd < b[1])
                accumulate_tp_fp(
                    det_corners[dsel], det_scores[dsel], gt_corners[gsel],
                    stats[b], t,
                )

    res = {"overall": eval_final_results(overall)}
    lines = [
        "overall  AP@0.3 {ap_30:.4f}  AP@0.5 {ap_50:.4f}  AP@0.7 "
        "{ap_70:.4f}".format(**res["overall"])
    ]
    for b in buckets:
        r = eval_final_results(stats[b])
        key = f"{b[0]:g}-{b[1]:g}m" if b[1] < 1e8 else f"{b[0]:g}m+"
        res[key] = r
        lines.append(
            f"{key:8s} AP@0.3 {r['ap_30']:.4f}  AP@0.5 {r['ap_50']:.4f}"
            f"  AP@0.7 {r['ap_70']:.4f}  (gt={stats[b][0.3]['gt']})"
        )
    print("\n".join(lines))
    save_yaml(res, os.path.join(opt.model_dir, "abl_object_dist.yaml"))


if __name__ == "__main__":
    main()
