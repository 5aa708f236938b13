"""Precompute pose-graph-corrected agent poses over a dataset split
(twin of reference tools/pose_graph_pre_calc.py:1-236).

  python -m airv2x_tpu.tools.pose_graph_pre_calc --hypes_yaml <cfg> \
      [--split_dir dataset/airv2x/train] --output stage1_poses \
      [--pos_std 0.4 --rot_std 0.1]

For every sample: perturb the non-ego agent poses with the configured
gaussian noise (the reference sweeps pos_std/rot_std lists), run the SE(2)
agent-object pose-graph refinement (utils/pose_graph.refine_agent_poses,
the CoAlign optimization), and save per-sample corrected pairwise
transforms ``sample_{idx:06d}.npz`` (keys: ``pairwise_t`` (L, 4, 4),
``agent_mask``) into ``<output>/pos{p}_rot{r}/``. Training with CoAlign can
then load these instead of the noisy poses, matching the reference's
stage-1 precompute. Falls back to synthetic scenes without a dataset.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="pose graph precompute")
    p.add_argument("--hypes_yaml", required=True)
    p.add_argument("--split_dir", default="")
    p.add_argument("--output", required=True)
    p.add_argument("--pos_std", type=float, nargs="*", default=[0.4])
    p.add_argument("--rot_std", type=float, nargs="*", default=[0.1])
    p.add_argument("--max_samples", type=int, default=0)
    p.add_argument("--num_scenes", type=int, default=16, help="synthetic fallback")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def _boxes_to_se2(boxes, mask):
    """(G, 7) hwl boxes -> (K, 3) [cx, cy, yaw] observations."""
    m = np.asarray(mask, bool)
    b = np.asarray(boxes)[m]
    return np.stack([b[:, 0], b[:, 1], b[:, 6]], axis=-1) if len(b) else (
        np.zeros((0, 3))
    )


def _se2_to_mat(pose):
    tx, ty, yaw = pose
    c, s = np.cos(yaw), np.sin(yaw)
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[0, 1], m[0, 3] = c, -s, tx
    m[1, 0], m[1, 1], m[1, 3] = s, c, ty
    return m


def main():
    opt = parse_args()

    from airv2x_tpu.config import load_yaml
    from airv2x_tpu.data.airv2x_dataset import AirV2XDataset
    from airv2x_tpu.data.synthetic import make_scene
    from airv2x_tpu.models.base import SlotLayout
    from airv2x_tpu.utils.pose_graph import refine_agent_poses

    hypes = load_yaml(opt.hypes_yaml)
    layout = SlotLayout.from_args(hypes["model"]["args"])
    lidar_range = hypes["preprocess"]["cav_lidar_range"]

    split = opt.split_dir or hypes.get("root_dir", "")
    use_dataset = split and os.path.isdir(split)

    def sample_iter():
        if use_dataset:
            ds = AirV2XDataset(hypes, split, train=False)
            n = len(ds) if not opt.max_samples else min(len(ds), opt.max_samples)
            for i in range(n):
                yield ds[i]
        else:
            rng = np.random.default_rng(opt.seed)
            for _ in range(opt.num_scenes):
                yield make_scene(
                    rng, layout, points_per_agent=1024, lidar_range=lidar_range
                )

    if len(opt.pos_std) != len(opt.rot_std):
        raise SystemExit(
            f"--pos_std and --rot_std sweeps must have equal length "
            f"({len(opt.pos_std)} vs {len(opt.rot_std)})"
        )
    rng = np.random.default_rng(opt.seed)
    for pos_std, rot_std in zip(opt.pos_std, opt.rot_std):
        out_dir = os.path.join(opt.output, f"pos{pos_std}_rot{rot_std}")
        os.makedirs(out_dir, exist_ok=True)
        residuals = []
        idx = -1
        for idx, (batch, gt) in enumerate(sample_iter()):
            am = np.asarray(batch["agent_mask"], bool)
            L = am.shape[0]
            obs = _boxes_to_se2(gt["boxes"], gt["mask"])

            # every agent observes the (ego-frame) objects from its own
            # noisy pose; agent 0 (ego) is the anchor
            # true per-agent poses in the ego frame are identity here (the
            # dataset already projects to ego); each live agent observes the
            # shared objects, and the refinement must pull the noisy pose
            # initialization back toward identity
            live = np.where(am)[0]
            noisy = np.zeros((len(live), 3))
            noisy[1:, :2] += rng.normal(0, pos_std, (len(live) - 1, 2))
            noisy[1:, 2] += rng.normal(0, rot_std, len(live) - 1)

            agent_boxes = [obs for _ in live]
            refined = refine_agent_poses(agent_boxes, noisy)

            pairwise = np.tile(np.eye(4, dtype=np.float32), (L, 1, 1))
            for k, slot in enumerate(live):
                pairwise[slot] = _se2_to_mat(refined[k])
            np.savez(
                os.path.join(out_dir, f"sample_{idx:06d}.npz"),
                pairwise_t=pairwise,
                agent_mask=am,
            )
            residuals.append(np.abs(refined[1:]).mean() if len(live) > 1 else 0.0)
        mean_res = float(np.mean(residuals)) if residuals else float("nan")
        print(
            f"pos_std={pos_std} rot_std={rot_std}: {idx + 1} samples -> "
            f"{out_dir} (mean residual pose error {mean_res:.4f})"
        )


if __name__ == "__main__":
    main()
