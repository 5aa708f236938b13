"""Inference + AP evaluation CLI (twin of reference inference_airv2x.py /
inference_multi_scenario.py).

  python -m airv2x_tpu.tools.inference --model_dir <run_dir> [--epoch N]

Loads the best (or given) epoch from the run dir, decodes detections fully
on device (objectness gate -> filters -> rotated NMS), and reports VOC AP at
IoU 0.3 / 0.5 / 0.7 plus the mean communication rate, writing
``results.txt`` and ``eval_epoch{N}.yaml`` like the reference
(eval_utils_airv2x.eval_final_results :162-196).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="airv2x_tpu inference")
    p.add_argument("--model_dir", type=str, required=True)
    p.add_argument("--hypes_yaml", type=str, default="")
    p.add_argument("--epoch", type=int, default=0, help="0 = best epoch")
    p.add_argument("--num_scenes", type=int, default=32)
    p.add_argument(
        "--obj_threshold", type=float, default=0.0,
        help="override the config's objectness gate (0 = use config)",
    )
    p.add_argument("--seed", type=int, default=123)
    p.add_argument(
        "--fusion_method",
        choices=["intermediate", "late"],
        default="intermediate",
        help="late = run the model per agent and fuse boxes after decode "
        "(reference inference_utils.inference_late_fusion)",
    )
    return p.parse_args()


def main():
    opt = parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from airv2x_tpu.config import load_yaml, save_yaml
    from airv2x_tpu.data.postprocess import decode_detections, decode_late_fusion
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
    model = build_model(hypes)
    layout = SlotLayout.from_args(hypes["model"]["args"])
    anchors = jnp.asarray(generate_anchor_grid(hypes["postprocess"]["anchor_args"]))

    rng = np.random.default_rng(opt.seed)
    core = hypes["model"]["core_method"].lower()
    needs_radar = any(k in core for k in ("l4dr", "lrf", "interf", "mdd"))
    scene_kw = dict(
        num_objects=8,
        points_per_agent=int(hypes["preprocess"].get("max_points", 8192)),
        lidar_range=hypes["preprocess"]["cav_lidar_range"],
        radar_points_per_agent=(
            int(hypes["preprocess"].get("max_points", 8192)) // 8
            if needs_radar else 0
        ),
    )
    scene0, _ = make_scene(rng, layout, **scene_kw)
    example = jax.tree.map(lambda x: jnp.asarray(x)[None], scene0)

    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)}, example
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
    lidar_range = jnp.asarray(hypes["preprocess"]["cav_lidar_range"], jnp.float32)

    @jax.jit
    def infer_late(state_params, state_stats, batch):
        # per-agent forward: replicate the sample L times with a one-hot
        # agent mask so each replica sees exactly one live agent in its
        # natural slot (works for hetero layouts), then box-level fusion at
        # decode — the reference's no-collaboration late path
        pts = batch["points"][0]
        l = pts.shape[0]
        rep = lambda a: jnp.broadcast_to(a[0][None], (l,) + a[0].shape)
        per_agent = {
            "points": rep(batch["points"]),
            "points_mask": rep(batch["points_mask"]),
            "agent_mask": jnp.eye(l, dtype=bool) & batch["agent_mask"][0][None],
            "pairwise_t": jnp.broadcast_to(jnp.eye(4), (l, l, 4, 4)),
            "pairwise_t_full": jnp.broadcast_to(jnp.eye(4), (l, l, l, 4, 4)),
            "prior_encoding": rep(batch["prior_encoding"]),
        }
        out = model.apply(
            {"params": state_params, "batch_stats": state_stats},
            per_agent,
            train=False,
        )
        det = decode_late_fusion(
            out["psm"],
            out["rm"],
            out.get("obj", out["psm"]),
            anchors,
            batch["pairwise_t"][0],
            batch["agent_mask"][0],
            lidar_range,
            num_class=hypes["num_class"],
            obj_threshold=tgt["obj_threshold"],
            nms_thresh=hypes["postprocess"]["nms_thresh"],
            top_k=int(hypes["postprocess"].get("nms_top_k", 512)),
        )
        return det, out.get("comm_rate", jnp.asarray(0.0))

    @jax.jit
    def infer(state_params, state_stats, batch):
        out = model.apply(
            {"params": state_params, "batch_stats": state_stats}, batch, train=False
        )
        det = decode_detections(
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
        return det, out.get("comm_rate", jnp.asarray(1.0))

    stat = new_result_stat()
    comm_rates = []
    rng = np.random.default_rng(opt.seed)
    for _ in range(opt.num_scenes):
        scene, gt = make_scene(rng, layout, **scene_kw)
        batch = jax.tree.map(lambda x: jnp.asarray(x)[None], scene)
        run = infer_late if opt.fusion_method == "late" else infer
        det, rate = run(state.params, state.batch_stats, batch)
        comm_rates.append(float(rate))

        keep = np.asarray(det.mask)
        det_corners = np.asarray(det.corners)[keep][:, :4, :2]
        det_scores = np.asarray(det.scores)[keep]
        gt_boxes = gt["boxes"][gt["mask"]]
        gt_corners = np.asarray(
            geo.boxes_to_corners_bev(jnp.asarray(gt_boxes), order="hwl")
        )
        for t in (0.3, 0.5, 0.7):
            accumulate_tp_fp(det_corners, det_scores, gt_corners, stat, t)

    res = eval_final_results(stat)
    res["comm_rate"] = float(np.mean(comm_rates))
    msg = (
        f"AP@0.3: {res['ap_30']:.4f} AP@0.5: {res['ap_50']:.4f} "
        f"AP@0.7: {res['ap_70']:.4f} comm_rate: {res['comm_rate']:.4f}"
    )
    print(msg)
    with open(os.path.join(opt.model_dir, "results.txt"), "a") as f:
        f.write(msg + "\n")
    save_yaml(res, os.path.join(opt.model_dir, f"eval_epoch{epoch}.yaml"))


if __name__ == "__main__":
    main()
