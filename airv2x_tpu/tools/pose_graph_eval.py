"""CoAlign pose-graph refinement evaluation CLI
(twin of tools/pose_graph_pre_calc.py + pose_graph_evaluate.py).

Simulates localization error on multi-agent box observations and reports
pose error before/after the SE(2) agent-object pose-graph optimization.

  python -m airv2x_tpu.tools.pose_graph_eval --num_scenes 20 --noise 0.4
"""

from __future__ import annotations

import argparse

import numpy as np

from airv2x_tpu.utils.pose_graph import refine_agent_poses


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num_scenes", type=int, default=20)
    p.add_argument("--num_agents", type=int, default=4)
    p.add_argument("--num_objects", type=int, default=10)
    p.add_argument("--noise", type=float, default=0.4, help="xyz/yaw std")
    p.add_argument("--seed", type=int, default=0)
    opt = p.parse_args()

    rng = np.random.default_rng(opt.seed)
    errs_before, errs_after = [], []
    for _ in range(opt.num_scenes):
        world = np.stack(
            [
                rng.uniform(-40, 40, opt.num_objects),
                rng.uniform(-20, 20, opt.num_objects),
                rng.uniform(-np.pi, np.pi, opt.num_objects),
            ],
            axis=-1,
        )
        true_poses = np.zeros((opt.num_agents, 3))
        true_poses[1:, 0] = rng.uniform(-20, 20, opt.num_agents - 1)
        true_poses[1:, 1] = rng.uniform(-10, 10, opt.num_agents - 1)
        true_poses[1:, 2] = rng.uniform(-0.5, 0.5, opt.num_agents - 1)

        def to_frame(pose):
            tx, ty, yaw = pose
            c, s = np.cos(yaw), np.sin(yaw)
            x = world[:, 0] - tx
            y = world[:, 1] - ty
            return np.stack(
                [c * x + s * y, -s * x + c * y, world[:, 2] - yaw], axis=-1
            )

        agent_boxes = [to_frame(pp) for pp in true_poses]
        noisy = true_poses.copy()
        noisy[1:, :2] += rng.normal(0, opt.noise, (opt.num_agents - 1, 2))
        noisy[1:, 2] += rng.normal(0, opt.noise * 0.25, opt.num_agents - 1)

        refined = refine_agent_poses(agent_boxes, noisy)
        errs_before.append(np.abs(noisy[1:] - true_poses[1:]).mean())
        errs_after.append(np.abs(refined[1:] - true_poses[1:]).mean())

    print(
        f"mean pose error before: {np.mean(errs_before):.4f}  "
        f"after refinement: {np.mean(errs_after):.4f}  "
        f"({np.mean(errs_after) / max(np.mean(errs_before), 1e-9):.1%} residual)"
    )


if __name__ == "__main__":
    main()
