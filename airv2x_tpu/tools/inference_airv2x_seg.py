"""BEV segmentation mIoU evaluation CLI (twin of reference
tools/inference_airv2x_seg.py:103-240 / eval_utils_airv2x.evaluate_segmentation
:447-617).

  python -m airv2x_tpu.tools.inference_airv2x_seg --model_dir <run_dir> \
      [--test_dir dataset/airv2x/test]

Argmax label maps per branch (post_process_segmentation_airv2x :842-861),
bucketed per scenario like the reference's timestamp-regex grouping, then
per-class IoU / Dice / precision / recall / F1 + mIoU per branch and
combined. Real dataset when on disk; synthetic rasterized labels otherwise.
Writes ``results_seg.txt`` and ``eval_seg_epoch{N}.yaml``.
"""

from __future__ import annotations

import argparse
import os
from functools import partial

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="airv2x_tpu seg mIoU eval")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--test_dir", default="")
    p.add_argument("--epoch", type=int, default=0, help="0 = best epoch")
    p.add_argument("--num_scenes", type=int, default=16, help="synthetic fallback")
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
    from airv2x_tpu.data.synthetic import make_scene, rasterize_seg_labels
    from airv2x_tpu.eval.seg_metrics import evaluate_branch
    from airv2x_tpu.models import build_model
    from airv2x_tpu.models.base import SlotLayout
    from airv2x_tpu.parallel.train import create_train_state, make_optimizer
    from airv2x_tpu.utils.checkpoint import find_best_epoch, load_checkpoint

    hypes = load_yaml(None, opt.model_dir)
    if hypes.get("task", hypes["model"]["args"].get("task")) != "seg":
        raise SystemExit("model_dir config is not a seg-task experiment")
    model = build_model(hypes)
    layout = SlotLayout.from_args(hypes["model"]["args"])
    lidar_range = hypes["preprocess"]["cav_lidar_range"]
    seg_hw = int(hypes.get("seg_hw", hypes["model"]["args"]["seg_hw"]))
    seg_res = float(hypes.get("seg_res", hypes["model"]["args"].get("seg_res", 0.25)))
    seg_branch = hypes["model"]["args"].get("seg_branch", "both")

    test_dir = opt.test_dir or hypes.get("test_dir", "")
    use_dataset = test_dir and os.path.isdir(test_dir)

    def sample_iter():
        if use_dataset:
            ds = AirV2XDataset(hypes, test_dir, train=False)
            n = len(ds) if not opt.max_samples else min(len(ds), opt.max_samples)
            for i in range(n):
                scen = os.path.basename(ds.samples[i][0])
                batch, gt = ds[i]
                dyn = batch.get("dynamic_seg_label")
                sta = batch.get("static_seg_label")
                if dyn is None:
                    dyn = rasterize_seg_labels(
                        gt["boxes"], gt["mask"], gt["classes"], seg_hw, seg_res
                    )
                if sta is None:
                    sta = np.zeros_like(dyn)
                yield scen, batch, dyn, sta
        else:
            rng = np.random.default_rng(opt.seed)
            for i in range(opt.num_scenes):
                batch, gt = make_scene(
                    rng,
                    layout,
                    points_per_agent=int(hypes["preprocess"].get("max_points", 8192)),
                    lidar_range=lidar_range,
                )
                dyn = rasterize_seg_labels(
                    gt["boxes"], gt["mask"], gt["classes"], seg_hw, seg_res
                )
                yield f"synthetic_{i % 4}", batch, dyn, np.zeros_like(dyn)

    first = next(iter(sample_iter()))
    model_keys = {"points", "points_mask", "agent_mask", "pairwise_t",
                  "prior_encoding"}

    def to_model_batch(b):
        return {
            k: jnp.asarray(v)[None]
            for k, v in b.items()
            if k in model_keys or k.startswith("cam_") or k.startswith("radar")
        }

    example = to_model_batch(first[1])
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

    from airv2x_tpu.utils.compile_opts import model_compiler_options

    @partial(jax.jit, compiler_options=model_compiler_options(hypes))
    def infer(params, stats, batch):
        out = model.apply(
            {"params": params, "batch_stats": stats}, batch, train=False
        )
        res = {}
        if "dynamic_seg" in out:
            res["dynamic"] = jnp.argmax(out["dynamic_seg"][0], axis=-1)
        if "static_seg" in out:
            res["static"] = jnp.argmax(out["static_seg"][0], axis=-1)
        res["rate"] = out.get("comm_rate", jnp.asarray(1.0))
        return res

    buckets = {}
    comm_rates = []
    n_samples = 0
    for scen, scene, gt_dyn, gt_sta in sample_iter():
        pred = infer(state.params, state.batch_stats, to_model_batch(scene))
        comm_rates.append(float(pred["rate"]))
        n_samples += 1
        b = buckets.setdefault(
            scen, {"gd": [], "pd": [], "gs": [], "ps": []}
        )
        if "dynamic" in pred:
            b["gd"].append(np.asarray(gt_dyn))
            b["pd"].append(np.asarray(pred["dynamic"]))
        if "static" in pred:
            b["gs"].append(np.asarray(gt_sta))
            b["ps"].append(np.asarray(pred["static"]))

    dynamic_class = int(hypes["model"]["args"].get("dynamic_class", 7))
    static_class = int(hypes["model"]["args"].get("static_class", 3))

    def branch_eval(gts, preds, ncls):
        if not gts:
            return None
        return evaluate_branch(
            np.stack(gts), np.stack(preds), num_classes=ncls
        )

    lines = [f"samples: {n_samples}  comm_rate: {float(np.mean(comm_rates)):.4f}"]
    all_gd, all_pd, all_gs, all_ps = [], [], [], []
    for scen, b in sorted(buckets.items()):
        parts = []
        d = branch_eval(b["gd"], b["pd"], dynamic_class)
        s = branch_eval(b["gs"], b["ps"], static_class)
        if d:
            parts.append(f"dyn mIoU {d['mean_iou']:.4f}")
            all_gd += b["gd"]
            all_pd += b["pd"]
        if s:
            parts.append(f"sta mIoU {s['mean_iou']:.4f}")
            all_gs += b["gs"]
            all_ps += b["ps"]
        lines.append(f"{scen}: " + "  ".join(parts))

    result = {"num_samples": n_samples,
              "comm_rate": float(np.mean(comm_rates)) if comm_rates else 0.0}
    combined_iou = []
    d = branch_eval(all_gd, all_pd, dynamic_class)
    if d:
        lines.append(
            "DYNAMIC: mIoU {:.4f}  per-class IoU {}".format(
                d["mean_iou"],
                " ".join(f"{v:.3f}" for v in d["iou_per_class"]),
            )
        )
        result["dynamic"] = {
            k: (v.tolist() if isinstance(v, np.ndarray) else float(v))
            for k, v in d.items()
        }
        combined_iou.append(d["mean_iou"])
    s = branch_eval(all_gs, all_ps, static_class)
    if s:
        lines.append(
            "STATIC: mIoU {:.4f}  per-class IoU {}".format(
                s["mean_iou"],
                " ".join(f"{v:.3f}" for v in s["iou_per_class"]),
            )
        )
        result["static"] = {
            k: (v.tolist() if isinstance(v, np.ndarray) else float(v))
            for k, v in s.items()
        }
        combined_iou.append(s["mean_iou"])
    if combined_iou:
        result["combined_miou"] = float(np.mean(combined_iou))
        lines.append(f"COMBINED mIoU: {result['combined_miou']:.4f}")

    for line in lines:
        print(line)
    with open(os.path.join(opt.model_dir, "results_seg.txt"), "a") as f:
        f.write("\n".join(lines) + "\n")
    save_yaml(result, os.path.join(opt.model_dir, f"eval_seg_epoch{epoch}.yaml"))


if __name__ == "__main__":
    main()
