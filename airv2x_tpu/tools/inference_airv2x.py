"""Multiclass mAP evaluation CLI (twin of reference tools/inference_airv2x.py
:90-240 / eval_utils_airv2x.eval_multiclass_results :322-426).

  python -m airv2x_tpu.tools.inference_airv2x --model_dir <run_dir> \
      [--test_dir dataset/airv2x/test]

Per-class greedy TP/FP matching at IoU {0.3, 0.5, 0.7}, per-class AP table
and mAP over classes with ground truth, plus mean communication rate.
Evaluates the on-disk dataset when present; synthetic scenes otherwise so
the tool stays exercisable anywhere. Writes ``results_multiclass.txt`` and
``eval_multiclass_epoch{N}.yaml`` in the run dir.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="airv2x_tpu multiclass mAP eval")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--test_dir", default="")
    p.add_argument("--epoch", type=int, default=0, help="0 = best epoch")
    p.add_argument("--num_scenes", type=int, default=32, help="synthetic fallback")
    p.add_argument("--max_samples", type=int, default=0, help="0 = all")
    p.add_argument("--seed", type=int, default=123)
    return p.parse_args()


def main():
    opt = parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from airv2x_tpu.config import load_yaml, save_yaml
    from airv2x_tpu.data.airv2x_dataset import AirV2XDataset
    from airv2x_tpu.data.postprocess import decode_detections
    from airv2x_tpu.data.synthetic import make_scene
    from airv2x_tpu.eval.ap import (
        IOU_THRESHOLDS,
        accumulate_multiclass,
        eval_multiclass_results,
        new_multiclass_stat,
    )
    from airv2x_tpu.models import build_model
    from airv2x_tpu.models.base import SlotLayout
    from airv2x_tpu.ops import geometry as geo
    from airv2x_tpu.ops.anchors import generate_anchor_grid
    from airv2x_tpu.parallel.train import create_train_state, make_optimizer
    from airv2x_tpu.utils.checkpoint import find_best_epoch, load_checkpoint

    hypes = load_yaml(None, opt.model_dir)
    model = build_model(hypes)
    layout = SlotLayout.from_args(hypes["model"]["args"])
    anchors = jnp.asarray(generate_anchor_grid(hypes["postprocess"]["anchor_args"]))
    lidar_range = hypes["preprocess"]["cav_lidar_range"]
    tgt = hypes["postprocess"]["target_args"]
    num_class = int(hypes["num_class"])
    lr = jnp.asarray(lidar_range, jnp.float32)

    test_dir = opt.test_dir or hypes.get("test_dir", "")
    use_dataset = test_dir and os.path.isdir(test_dir)

    def sample_iter():
        if use_dataset:
            ds = AirV2XDataset(hypes, test_dir, train=False)
            n = len(ds) if not opt.max_samples else min(len(ds), opt.max_samples)
            for i in range(n):
                yield ds[i]
        else:
            rng = np.random.default_rng(opt.seed)
            for _ in range(opt.num_scenes):
                yield make_scene(
                    rng,
                    layout,
                    points_per_agent=int(hypes["preprocess"].get("max_points", 8192)),
                    lidar_range=lidar_range,
                )

    first_batch, _ = next(iter(sample_iter()))
    example = jax.tree.map(lambda x: jnp.asarray(x)[None], first_batch)
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

    @jax.jit
    def infer(params, stats, batch):
        out = model.apply(
            {"params": params, "batch_stats": stats}, batch, train=False
        )
        det = decode_detections(
            out["psm"][0],
            out["rm"][0],
            out.get("obj", out["psm"])[0],
            anchors,
            jnp.eye(4),
            lr,
            num_class=num_class,
            obj_threshold=tgt["obj_threshold"],
            nms_thresh=hypes["postprocess"]["nms_thresh"],
            top_k=int(hypes["postprocess"].get("nms_top_k", 512)),
        )
        return det, out.get("comm_rate", jnp.asarray(1.0))

    stat = new_multiclass_stat(num_class)
    comm_rates = []
    n_samples = 0
    for scene, gt in sample_iter():
        batch = jax.tree.map(lambda x: jnp.asarray(x)[None], scene)
        det, rate = infer(state.params, state.batch_stats, batch)
        comm_rates.append(float(rate))
        n_samples += 1

        keep = np.asarray(det.mask)
        det_c = np.asarray(det.corners)[keep][:, :4, :2]
        det_s = np.asarray(det.scores)[keep]
        det_l = np.asarray(det.labels)[keep]
        gm = gt["mask"].astype(bool)
        gt_boxes = gt["boxes"][gm]
        gt_labels = np.asarray(gt["classes"])[gm]
        gt_c = np.asarray(
            geo.boxes_to_corners_bev(jnp.asarray(gt_boxes), order="hwl")
        )
        accumulate_multiclass(det_c, det_s, det_l, gt_c, gt_labels, stat)

    res = eval_multiclass_results(stat)
    res["comm_rate"] = float(np.mean(comm_rates)) if comm_rates else 0.0
    res["num_samples"] = n_samples

    lines = [f"samples: {n_samples}  comm_rate: {res['comm_rate']:.4f}"]
    for c in sorted(res["per_class"]):
        aps = res["per_class"][c]
        lines.append(
            f"class {c}: "
            + "  ".join(
                f"AP@{t}: {aps.get(f'ap_{int(t * 100)}', 0.0):.4f}"
                for t in IOU_THRESHOLDS
            )
        )
    lines.append(
        "  ".join(
            f"mAP@{t}: {res[f'map_{int(t * 100)}']:.4f}" for t in IOU_THRESHOLDS
        )
    )
    for line in lines:
        print(line)
    with open(os.path.join(opt.model_dir, "results_multiclass.txt"), "a") as f:
        f.write("\n".join(lines) + "\n")
    yaml_res = {
        "per_class": {
            int(c): {k: float(v) for k, v in d.items()}
            for c, d in res["per_class"].items()
        },
        **{
            k: float(v)
            for k, v in res.items()
            if k not in ("per_class",)
        },
    }
    save_yaml(
        yaml_res, os.path.join(opt.model_dir, f"eval_multiclass_epoch{epoch}.yaml")
    )


if __name__ == "__main__":
    main()
