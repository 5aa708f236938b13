"""Bounded smoke-inference: first N samples, per-frame BEV + 3D renders.

Twin of the reference's ``opencood/tools/inference_tiny.py`` (:55-160),
which evaluates a ``Subset(dataset, range(150))`` and writes a 3D and a BEV
visualization for every frame before the final AP table. Useful as a quick
"is this run dir sane" pass without walking the whole test split.

  python -m airv2x_tpu.tools.inference_tiny --model_dir <run_dir> \
      [--test_dir dataset/airv2x/test] [--max_samples 150]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="airv2x_tpu tiny inference")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--test_dir", default="")
    p.add_argument("--epoch", type=int, default=0, help="0 = best epoch")
    p.add_argument(
        "--max_samples", type=int, default=150,
        help="evaluate only the first N samples (reference Subset(range(150)))",
    )
    p.add_argument("--num_scenes", type=int, default=8,
                   help="synthetic fallback scene count")
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
    from airv2x_tpu.utils.checkpoint import find_best_epoch, load_checkpoint
    from airv2x_tpu.visualization.bev_canvas import visualize
    from airv2x_tpu.visualization.canvas_3d import Canvas3D

    hypes = load_yaml(None, opt.model_dir)
    model = build_model(hypes)
    layout = SlotLayout.from_args(hypes["model"]["args"])
    anchors = jnp.asarray(
        generate_anchor_grid(hypes["postprocess"]["anchor_args"])
    )
    lidar_range = hypes["preprocess"]["cav_lidar_range"]
    tgt = hypes["postprocess"]["target_args"]

    test_dir = opt.test_dir or hypes.get("test_dir", "")

    def sample_iter():
        if test_dir and os.path.isdir(test_dir):
            from airv2x_tpu.data.airv2x_dataset import AirV2XDataset

            ds = AirV2XDataset(hypes, test_dir, train=False)
            for i in range(min(len(ds), opt.max_samples)):
                yield ds[i]
        else:
            rng = np.random.default_rng(opt.seed)
            for _ in range(min(opt.num_scenes, opt.max_samples)):
                yield make_scene(
                    rng, layout,
                    points_per_agent=int(
                        hypes["preprocess"].get("max_points", 8192)
                    ),
                    lidar_range=lidar_range,
                )

    first_scene, _ = next(iter(sample_iter()))
    example = jax.tree.map(lambda x: jnp.asarray(x)[None], first_scene)
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

    @jax.jit
    def infer(params, stats, batch):
        out = model.apply(
            {"params": params, "batch_stats": stats}, batch, train=False
        )
        det = decode_detections(
            out["psm"][0], out["rm"][0],
            out.get("obj", out["psm"])[0],
            anchors, jnp.eye(4),
            jnp.asarray(lidar_range, jnp.float32),
            num_class=hypes["num_class"],
            obj_threshold=tgt["obj_threshold"],
            nms_thresh=hypes["postprocess"]["nms_thresh"],
            top_k=int(hypes["postprocess"].get("nms_top_k", 512)),
        )
        return det

    vis_dir = os.path.join(opt.model_dir, "vis")
    os.makedirs(vis_dir, exist_ok=True)
    stat = new_result_stat()
    for i, (scene, gt) in enumerate(sample_iter()):
        batch = jax.tree.map(lambda x: jnp.asarray(x)[None], scene)
        det = infer(state.params, state.batch_stats, batch)
        keep = np.asarray(det.mask)
        det_c3 = np.asarray(det.corners)[keep]
        det_s = np.asarray(det.scores)[keep]
        gt_boxes = gt["boxes"][gt["mask"]]
        gt_c3 = np.asarray(
            geo.boxes_to_corners_3d(jnp.asarray(gt_boxes), order="hwl")
        )
        for t in (0.3, 0.5, 0.7):
            accumulate_tp_fp(
                det_c3[:, :4, :2], det_s, gt_c3[:, :4, :2], stat, t
            )

        # per-frame renders, like the reference's vis/3d_%05d + bev_%05d
        pts = scene["points"][scene["points_mask"]].reshape(-1, 4)
        visualize(
            det_c3, gt_c3, pts, lidar_range,
            save_path=os.path.join(vis_dir, f"bev_{i:05d}.png"),
        )
        c3d = Canvas3D()
        c3d.draw_points(pts[:, :3], (160, 160, 160))
        if det_c3.size:
            c3d.draw_boxes(det_c3, (255, 60, 60))
        if gt_c3.size:
            c3d.draw_boxes(gt_c3, (60, 255, 60))
        c3d.save(os.path.join(vis_dir, f"3d_{i:05d}.png"))
        print(i)

    res = eval_final_results(stat)
    msg = (
        f"AP@0.3: {res['ap_30']:.4f} AP@0.5: {res['ap_50']:.4f} "
        f"AP@0.7: {res['ap_70']:.4f}"
    )
    print(msg)
    with open(os.path.join(opt.model_dir, "results.txt"), "a") as f:
        f.write("tiny: " + msg + "\n")


if __name__ == "__main__":
    main()
