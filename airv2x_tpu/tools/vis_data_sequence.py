"""Render a data sequence to BEV PNG frames.

Capability twin of the reference sequence viewers
(opencood/visualization/vis_data_sequence*.py): per frame, agent point
clouds (one color per agent type) + GT boxes on a BEV canvas. Works on the
synthetic scene generator (default — no dataset needed) or a real dataset
root via ``--root_dir``.

Usage:
    python -m airv2x_tpu.tools.vis_data_sequence --hypes_yaml cfg.yaml \\
        --output_dir /tmp/seq_vis [--frames 10] [--root_dir dataset/...]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="BEV data-sequence renderer")
    p.add_argument("--hypes_yaml", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--frames", type=int, default=10)
    p.add_argument("--root_dir", default=None,
                   help="real dataset split dir; synthetic when omitted")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def _frame_arrays(batch, gt, layout):
    """(agent-type -> (P, 3) points), (N, 4, 2) gt corners."""
    import jax.numpy as jnp

    from airv2x_tpu.ops.geometry import boxes_to_corners_bev

    pts = np.asarray(batch["points"])
    mask = np.asarray(batch["points_mask"]).astype(bool)
    am = np.asarray(batch["agent_mask"]).astype(bool)
    if pts.ndim == 4 and pts.shape[0] in (1,):  # strip batch dim
        pts, mask, am = pts[0], mask[0], am[0]
    if pts.ndim == 4:  # temporal (T, L, N, 4): draw the current frame
        pts, mask, am = pts[-1], mask[-1], am[-1]

    agent_points = {}
    for t in ("vehicle", "rsu", "drone"):
        sl = layout.slots(t)
        rows = [
            pts[i][mask[i]]
            for i in range(sl.start, sl.stop)
            if i < len(am) and am[i]
        ]
        rows = [r for r in rows if len(r)]
        if rows:
            agent_points[t] = np.concatenate(rows, 0)[:, :3]

    corners = None
    boxes = gt.get("boxes") if isinstance(gt, dict) else None
    if boxes is not None and len(boxes):
        boxes = np.asarray(boxes)
        valid = np.abs(boxes).sum(-1) > 0
        if valid.any():
            corners = np.asarray(
                boxes_to_corners_bev(jnp.asarray(boxes[valid]))
            )
    return agent_points, corners


def main():
    opt = parse_args()

    from airv2x_tpu.config import load_yaml
    from airv2x_tpu.models.base import SlotLayout
    from airv2x_tpu.visualization.bev_canvas import visualize

    hypes = load_yaml(opt.hypes_yaml)
    layout = SlotLayout.from_args(hypes["model"]["args"])
    lidar_range = hypes["preprocess"]["cav_lidar_range"]
    os.makedirs(opt.output_dir, exist_ok=True)

    if opt.root_dir:
        from airv2x_tpu.data.airv2x_dataset import Airv2xDataset

        ds = Airv2xDataset(hypes, opt.root_dir, train=False)
        frames = (ds[i] for i in range(min(opt.frames, len(ds))))
    else:
        from airv2x_tpu.data.synthetic import make_scene

        rng = np.random.default_rng(opt.seed)

        def gen():
            for _ in range(opt.frames):
                scene, gt = make_scene(
                    rng, layout, num_objects=8,
                    points_per_agent=int(
                        hypes["preprocess"].get("max_points", 8192)
                    ),
                    lidar_range=lidar_range,
                )
                yield scene, gt

        frames = gen()

    for i, (batch, gt) in enumerate(frames):
        agent_points, corners = _frame_arrays(batch, gt, layout)
        out = os.path.join(opt.output_dir, f"frame_{i:04d}.png")
        visualize(
            pred_corners=None,
            gt_corners=corners,
            points=None,
            lidar_range=lidar_range,
            save_path=out,
            agent_points=agent_points,
        )
        print(f"[vis] {out}")
    print(f"[vis] wrote {i + 1} frames to {opt.output_dir}")


if __name__ == "__main__":
    main()
