"""Inference directly from a checkpoint file + yaml (no run dir needed).

Twin of the reference's ``opencood/tools/inference_pretrained.py`` (:28-285):
point at a checkpoint and a config instead of a training run directory, with
the same extras — a communication-threshold override (``--comm_thre``, the
reference patches ``hypes['model']['args']['fusion_args']['communication']
['thre']``), optional npy dumps of predictions/gt per frame
(``--save_npy``, reference inference_utils.save_prediction_gt), and a cap on
saved visualizations (``--save_vis_n``).

``--model_path`` accepts EITHER a reference torch ``.pth`` state dict
(converted in memory via utils/torch_convert, the same mapping
tools/convert_checkpoint.py persists) OR an orbax ``net_epoch{N}`` directory
saved by this repo.

  python -m airv2x_tpu.tools.inference_pretrained \
      --model_path net_epoch50.pth --hypes_yaml config.yaml
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="inference from a bare checkpoint")
    p.add_argument("--model_path", required=True,
                   help=".pth state dict or an orbax net_epoch{N} dir")
    p.add_argument("--hypes_yaml", required=True)
    p.add_argument("--num_scenes", type=int, default=16)
    p.add_argument("--comm_thre", type=float, default=None,
                   help="override the fusion communication threshold")
    p.add_argument("--save_npy", action="store_true",
                   help="dump pred/gt corners + scores per frame as npy")
    p.add_argument("--save_vis_n", type=int, default=0,
                   help="save BEV renders for the first N frames")
    p.add_argument("--out_dir", default="",
                   help="output dir (default: alongside the checkpoint)")
    p.add_argument("--seed", type=int, default=123)
    return p.parse_args()


def _apply_comm_thre(hypes: dict, thre: float) -> None:
    """Reference semantics: patch every communication.thre in model args."""
    def walk(node):
        if isinstance(node, dict):
            comm = node.get("communication")
            if isinstance(comm, dict) and "thre" in comm:
                comm["thre"] = thre
            for v in node.values():
                walk(v)
    walk(hypes["model"]["args"])


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

    hypes = load_yaml(opt.hypes_yaml)
    if opt.comm_thre is not None:
        _apply_comm_thre(hypes, opt.comm_thre)
    model = build_model(hypes)
    layout = SlotLayout.from_args(hypes["model"]["args"])
    anchors = jnp.asarray(
        generate_anchor_grid(hypes["postprocess"]["anchor_args"])
    )
    lidar_range = hypes["preprocess"]["cav_lidar_range"]
    tgt = hypes["postprocess"]["target_args"]

    rng = np.random.default_rng(opt.seed)
    scene_kw = dict(
        points_per_agent=int(hypes["preprocess"].get("max_points", 8192)),
        lidar_range=lidar_range,
    )
    scene0, _ = make_scene(rng, layout, **scene_kw)
    example = jax.tree.map(lambda x: jnp.asarray(x)[None], scene0)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)},
        example,
    )

    if opt.model_path.endswith((".pth", ".pt")):
        import torch

        from airv2x_tpu.utils.torch_convert import convert_state_dict

        sd = torch.load(opt.model_path, map_location="cpu",
                        weights_only=False)
        if not isinstance(sd, dict):
            sd = sd.state_dict()
        asg = convert_state_dict(sd, jax.device_get(variables), hypes)
        print(f"converted {len(asg.assigned)} tensors "
              f"({len(asg.skipped)} skipped)")
        variables = asg.variables
        params, stats = variables["params"], variables.get("batch_stats", {})
    else:
        from airv2x_tpu.utils.checkpoint import load_checkpoint

        tx, _ = make_optimizer(hypes)
        state = create_train_state(model, variables, tx)
        run_dir, name = os.path.split(os.path.normpath(opt.model_path))
        if not name.startswith("net_epoch"):
            raise SystemExit(
                f"--model_path must be a .pth or a net_epoch{{N}} dir, got "
                f"{opt.model_path}"
            )
        state = load_checkpoint(
            run_dir, int(name.replace("net_epoch", "")),
            jax.device_get(state),
        )
        params, stats = state.params, state.batch_stats

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
        return det, out.get("comm_rate", jnp.asarray(1.0))

    out_dir = opt.out_dir or (
        os.path.dirname(os.path.abspath(opt.model_path)) or "."
    )
    os.makedirs(out_dir, exist_ok=True)
    npy_dir = os.path.join(out_dir, "npy")
    if opt.save_npy:
        os.makedirs(npy_dir, exist_ok=True)

    stat = new_result_stat()
    comm_rates = []
    rng = np.random.default_rng(opt.seed)
    for i in range(opt.num_scenes):
        scene, gt = make_scene(rng, layout, **scene_kw)
        batch = jax.tree.map(lambda x: jnp.asarray(x)[None], scene)
        det, rate = infer(params, stats, batch)
        comm_rates.append(float(rate))
        keep = np.asarray(det.mask)
        det_c = np.asarray(det.corners)[keep]
        det_s = np.asarray(det.scores)[keep]
        gt_boxes = gt["boxes"][gt["mask"]]
        gt_c = np.asarray(
            geo.boxes_to_corners_3d(jnp.asarray(gt_boxes), order="hwl")
        )
        for t in (0.3, 0.5, 0.7):
            accumulate_tp_fp(det_c[:, :4, :2], det_s, gt_c[:, :4, :2],
                             stat, t)
        if opt.save_npy:  # reference inference_utils.save_prediction_gt
            np.save(os.path.join(npy_dir, f"{i:04d}_pcd.npy"),
                    scene["points"][scene["points_mask"]].reshape(-1, 4))
            np.save(os.path.join(npy_dir, f"{i:04d}_pred.npy"), det_c)
            np.save(os.path.join(npy_dir, f"{i:04d}_pred_score.npy"), det_s)
            np.save(os.path.join(npy_dir, f"{i:04d}_gt.npy"), gt_c)
        if i < opt.save_vis_n:
            from airv2x_tpu.visualization.bev_canvas import visualize

            visualize(
                det_c, gt_c,
                scene["points"][scene["points_mask"]].reshape(-1, 4),
                lidar_range,
                save_path=os.path.join(out_dir, f"vis_{i:04d}.png"),
            )

    res = eval_final_results(stat)
    res["comm_rate"] = float(np.mean(comm_rates))
    msg = (
        f"AP@0.3: {res['ap_30']:.4f} AP@0.5: {res['ap_50']:.4f} "
        f"AP@0.7: {res['ap_70']:.4f} comm_rate: {res['comm_rate']:.4f}"
    )
    print(msg)
    with open(os.path.join(out_dir, "results.txt"), "a") as f:
        f.write(msg + "\n")


if __name__ == "__main__":
    main()
