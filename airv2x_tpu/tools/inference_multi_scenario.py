"""Per-scenario evaluation over the on-disk dataset
(twin of tools/inference_multi_scenario.py:277-433).

Buckets AP statistics per scenario directory, reports AP@{0.3,0.5,0.7} per
scenario and combined, plus mean communication rate; writes ``results.txt``
in the run dir. Falls back to synthetic scenes (single bucket) when the
dataset directory is absent so the tool stays exercisable end-to-end.

  python -m airv2x_tpu.tools.inference_multi_scenario --model_dir <run> \
      [--test_dir dataset/airv2x/test]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", required=True)
    p.add_argument("--test_dir", default="")
    p.add_argument("--epoch", type=int, default=0)
    p.add_argument("--num_scenes", type=int, default=16, help="synthetic fallback")
    p.add_argument("--save_vis", action="store_true")
    p.add_argument(
        "--track",
        action="store_true",
        help="associate detections across frames (Hungarian tracker), "
        "writing per-frame track ids to tracks.txt",
    )
    p.add_argument("--vis_3d", action="store_true",
                   help="also render a perspective 3D view per frame")
    p.add_argument("--seed", type=int, default=123)
    return p.parse_args()


def main():
    opt = parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from airv2x_tpu.config import load_yaml
    from airv2x_tpu.data.airv2x_dataset import AirV2XDataset
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
    from airv2x_tpu.visualization.bev_canvas import visualize

    hypes = load_yaml(None, opt.model_dir)
    model = build_model(hypes)
    layout = SlotLayout.from_args(hypes["model"]["args"])
    anchors = jnp.asarray(generate_anchor_grid(hypes["postprocess"]["anchor_args"]))
    lidar_range = hypes["preprocess"]["cav_lidar_range"]
    tgt = hypes["postprocess"]["target_args"]
    lr = jnp.asarray(lidar_range, jnp.float32)

    test_dir = opt.test_dir or hypes.get("test_dir", "")
    use_dataset = test_dir and os.path.isdir(test_dir)

    def sample_iter():
        if use_dataset:
            ds = AirV2XDataset(hypes, test_dir, train=False)
            for i in range(len(ds)):
                scen = os.path.basename(ds.samples[i][0])
                batch, gt = ds[i]
                yield scen, batch, gt
        else:
            rng = np.random.default_rng(opt.seed)
            for i in range(opt.num_scenes):
                batch, gt = make_scene(
                    rng,
                    layout,
                    points_per_agent=int(
                        hypes["preprocess"].get("max_points", 8192)
                    ),
                    lidar_range=lidar_range,
                )
                yield f"synthetic_{i % 4}", batch, gt

    first = next(iter(sample_iter()))
    example = jax.tree.map(lambda x: jnp.asarray(x)[None], first[1])
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)}, example
    )
    tx, _ = make_optimizer(hypes)
    state = create_train_state(model, variables, tx)
    epoch = opt.epoch or find_best_epoch(opt.model_dir)
    if epoch:
        state = load_checkpoint(opt.model_dir, epoch, jax.device_get(state))
        print(f"loaded epoch {epoch}")

    @jax.jit
    def infer(params, stats, batch):
        out = model.apply(
            {"params": params, "batch_stats": stats}, batch, train=False
        )
        det = decode_detections(
            out["psm"][0],
            out["rm"][0],
            out.get("obj", out["psm"])[0],  # binary family: psm is the score
            anchors,
            jnp.eye(4),
            lr,
            num_class=hypes["num_class"],
            obj_threshold=tgt["obj_threshold"],
            nms_thresh=hypes["postprocess"]["nms_thresh"],
            top_k=int(hypes["postprocess"].get("nms_top_k", 512)),
        )
        return det, out.get("comm_rate", jnp.asarray(1.0))

    per_scenario = {}
    comm_rates = []
    vis_dir = os.path.join(opt.model_dir, "vis")
    if opt.save_vis:
        os.makedirs(vis_dir, exist_ok=True)

    # --track: per-scenario Hungarian trackers (models/tracking.Tracker).
    # The reference TrackingHead's roi-pooling placeholder pools the whole
    # BEV map, making every detection's appearance embedding identical
    # within a frame — useless for association — so the tool tracks on
    # normalized box geometry instead (position/size/heading), which the
    # same Tracker consumes unchanged.
    trackers: dict = {}
    track_lines: list = []

    def geometry_embedding(boxes):
        import numpy as _np

        lr_span = max(lidar_range[3] - lidar_range[0], 1.0)
        emb = _np.stack(
            [
                boxes[:, 0] / lr_span,
                boxes[:, 1] / lr_span,
                boxes[:, 2] / 10.0,
                boxes[:, 3] / 4.0,
                boxes[:, 4] / 4.0,
                boxes[:, 5] / 8.0,
                _np.cos(boxes[:, 6]),
                _np.sin(boxes[:, 6]),
            ],
            axis=1,
        )
        n = _np.linalg.norm(emb, axis=1, keepdims=True)
        return emb / _np.maximum(n, 1e-9)

    for i, (scen, scene, gt) in enumerate(sample_iter()):
        batch = jax.tree.map(lambda x: jnp.asarray(x)[None], scene)
        det, rate = infer(state.params, state.batch_stats, batch)
        comm_rates.append(float(rate))
        stat = per_scenario.setdefault(scen, new_result_stat())

        keep = np.asarray(det.mask)
        det_c = np.asarray(det.corners)[keep][:, :4, :2]
        det_s = np.asarray(det.scores)[keep]
        gt_boxes = gt["boxes"][gt["mask"]]
        gt_c = np.asarray(
            geo.boxes_to_corners_bev(jnp.asarray(gt_boxes), order="hwl")
        )
        for t in (0.3, 0.5, 0.7):
            accumulate_tp_fp(det_c, det_s, gt_c, stat, t)

        if opt.track:
            from airv2x_tpu.models.tracking import Tracker

            det_boxes = np.asarray(det.boxes)[keep]
            tracker = trackers.setdefault(scen, Tracker(sim_threshold=0.9))
            tids = tracker.update(det_boxes, geometry_embedding(det_boxes))
            track_lines.append(
                f"{scen} frame {i}: "
                + " ".join(
                    f"id={tid} xy=({b[0]:.1f},{b[1]:.1f})"
                    for tid, b in zip(tids, det_boxes)
                )
            )

        if opt.save_vis and i < 8:
            pts = scene["points"][scene["points_mask"]].reshape(-1, 4)
            visualize(
                det_c, gt_c, pts, lidar_range,
                save_path=os.path.join(vis_dir, f"frame_{i:04d}.png"),
            )
            if opt.vis_3d:
                from airv2x_tpu.visualization.canvas_3d import Canvas3D

                c3d = Canvas3D()
                c3d.draw_points(pts[:, :3], (160, 160, 160))
                det3d = np.asarray(det.corners)[keep]
                if det3d.size:
                    c3d.draw_boxes(det3d, (255, 60, 60))
                gt3d = np.asarray(
                    geo.boxes_to_corners_3d(jnp.asarray(gt_boxes), order="hwl")
                )
                if gt3d.size:
                    c3d.draw_boxes(gt3d, (60, 255, 60))
                c3d.save(os.path.join(vis_dir, f"frame3d_{i:04d}.png"))

    # combine buckets (combine_stat_by_scenarios :346)
    combined = new_result_stat()
    lines = []
    for scen, stat in sorted(per_scenario.items()):
        res = eval_final_results(stat)
        lines.append(f"{scen}: {res}")
        for t in (0.3, 0.5, 0.7):
            for k in ("tp", "fp", "score"):
                combined[t][k] += stat[t][k]
            combined[t]["gt"] += stat[t]["gt"]
    total = eval_final_results(combined)
    total["comm_rate"] = float(np.mean(comm_rates))
    lines.append(f"COMBINED: {total}")

    for line in lines:
        print(line)
    with open(os.path.join(opt.model_dir, "results.txt"), "a") as f:
        f.write("\n".join(lines) + "\n")
    if opt.track and track_lines:
        with open(os.path.join(opt.model_dir, "tracks.txt"), "w") as f:
            f.write("\n".join(track_lines) + "\n")
        print(f"wrote {len(track_lines)} tracked frames to tracks.txt")


if __name__ == "__main__":
    main()
