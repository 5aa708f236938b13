"""Pose-noise robustness sweep (twin of tools/inference_w_noise_*.py).

Evaluates detection AP under increasing localization error applied to the
non-ego agents' poses (the reference's wild_setting loc noise,
basedataset.py:699-758), reporting AP@{0.3,0.5,0.7} per noise level.

  python -m airv2x_tpu.tools.inference_w_noise --model_dir <run> \
      --noise_levels 0 0.2 0.4 0.6
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", type=str, required=True)
    p.add_argument("--epoch", type=int, default=0)
    p.add_argument("--num_scenes", type=int, default=16)
    p.add_argument(
        "--noise_levels", type=float, nargs="+", default=[0.0, 0.2, 0.4, 0.6]
    )
    p.add_argument("--seed", type=int, default=123)
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
    from airv2x_tpu.models import build_model
    from airv2x_tpu.models.base import SlotLayout
    from airv2x_tpu.ops import geometry as geo
    from airv2x_tpu.ops.anchors import generate_anchor_grid
    from airv2x_tpu.parallel.train import create_train_state, make_optimizer
    from airv2x_tpu.utils import transforms as tf
    from airv2x_tpu.utils.checkpoint import find_best_epoch, load_checkpoint

    hypes = load_yaml(None, opt.model_dir)
    model = build_model(hypes)
    layout = SlotLayout.from_args(hypes["model"]["args"])
    anchors = jnp.asarray(generate_anchor_grid(hypes["postprocess"]["anchor_args"]))
    lidar_range = jnp.asarray(hypes["preprocess"]["cav_lidar_range"], jnp.float32)
    tgt = hypes["postprocess"]["target_args"]

    rng0 = np.random.default_rng(opt.seed)
    scene0, _ = make_scene(
        rng0,
        layout,
        points_per_agent=int(hypes["preprocess"].get("max_points", 8192)),
        lidar_range=hypes["preprocess"]["cav_lidar_range"],
    )
    example = jax.tree.map(lambda x: jnp.asarray(x)[None], scene0)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)}, example
    )
    tx, _ = make_optimizer(hypes)
    state = create_train_state(model, variables, tx)
    epoch = opt.epoch or find_best_epoch(opt.model_dir)
    if epoch:
        state = load_checkpoint(opt.model_dir, epoch, jax.device_get(state))

    @jax.jit
    def infer(params, stats, batch):
        out = model.apply(
            {"params": params, "batch_stats": stats}, batch, train=False
        )
        return decode_detections(
            out["psm"][0],
            out["rm"][0],
            out.get("obj", out["psm"])[0],  # binary family: psm is the score
            anchors,
            jnp.eye(4),
            lidar_range,
            num_class=hypes["num_class"],
            obj_threshold=tgt["obj_threshold"],
            nms_thresh=hypes["postprocess"]["nms_thresh"],
            top_k=int(hypes["postprocess"].get("nms_top_k", 512)),
        )

    results = {}
    for std in opt.noise_levels:
        stat = new_result_stat()
        rng = np.random.default_rng(opt.seed)
        for _ in range(opt.num_scenes):
            scene, gt = make_scene(
                rng,
                layout,
                points_per_agent=int(hypes["preprocess"].get("max_points", 8192)),
                lidar_range=hypes["preprocess"]["cav_lidar_range"],
            )
            # perturb every non-ego agent's cloud by a noisy pose delta: the
            # proj_first pipeline bakes localization error into the points.
            for slot in range(1, layout.total):
                if not scene["agent_mask"][slot]:
                    continue
                noisy = tf.add_pose_noise(
                    np.zeros(6), rng, xyz_std=std, ryp_std=std
                )
                T = tf.pose_to_world(noisy).astype(np.float32)
                pts = scene["points"][slot]
                scene["points"][slot] = tf.transform_points(pts, T).astype(
                    np.float32
                )
            batch = jax.tree.map(lambda x: jnp.asarray(x)[None], scene)
            det = infer(state.params, state.batch_stats, batch)
            keep = np.asarray(det.mask)
            det_c = np.asarray(det.corners)[keep][:, :4, :2]
            det_s = np.asarray(det.scores)[keep]
            gt_boxes = gt["boxes"][gt["mask"]]
            gt_c = np.asarray(
                geo.boxes_to_corners_bev(jnp.asarray(gt_boxes), order="hwl")
            )
            for t in (0.3, 0.5, 0.7):
                accumulate_tp_fp(det_c, det_s, gt_c, stat, t)
        results[std] = eval_final_results(stat)
        print(f"noise std {std}: {results[std]}")

    with open(os.path.join(opt.model_dir, "noise_sweep.json"), "w") as f:
        json.dump({str(k): v for k, v in results.items()}, f, indent=2)


if __name__ == "__main__":
    main()
