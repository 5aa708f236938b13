import numpy as np

from airv2x_tpu.utils.pose_graph import match_boxes, refine_agent_poses


def _boxes_world(rng, k=6):
    return np.stack(
        [
            rng.uniform(-30, 30, k),
            rng.uniform(-15, 15, k),
            rng.uniform(-np.pi, np.pi, k),
        ],
        axis=-1,
    )


def _to_frame(boxes_world, pose):
    tx, ty, yaw = pose
    c, s = np.cos(yaw), np.sin(yaw)
    x = boxes_world[:, 0] - tx
    y = boxes_world[:, 1] - ty
    local = np.stack(
        [c * x + s * y, -s * x + c * y, boxes_world[:, 2] - yaw], axis=-1
    )
    return local


def test_match_boxes_greedy():
    a = np.array([[0.0, 0], [10, 0]])
    b = np.array([[10.2, 0], [0.3, 0], [50, 50]])
    pairs = dict(match_boxes(a, b, max_dist=1.0))
    assert pairs == {0: 1, 1: 0}


def test_refine_recovers_noisy_pose(rng):
    world = _boxes_world(rng)
    true_poses = np.array([[0, 0, 0], [5.0, -2.0, 0.3], [-8.0, 3.0, -0.2]])
    agent_boxes = [_to_frame(world, p) for p in true_poses]

    noisy = true_poses.copy()
    noisy[1] += [0.8, -0.5, 0.08]
    noisy[2] += [-0.6, 0.7, -0.06]

    refined = refine_agent_poses(agent_boxes, noisy, max_match_dist=3.0)
    # refined non-ego poses must be much closer to the truth than the noisy init
    err_init = np.abs(noisy[1:] - true_poses[1:]).sum()
    err_ref = np.abs(refined[1:] - true_poses[1:]).sum()
    assert err_ref < err_init * 0.2, (err_init, err_ref)


def test_refine_no_matches_returns_init(rng):
    boxes = [_boxes_world(rng, 2), np.zeros((0, 3))]
    init = np.array([[0, 0, 0], [5.0, 0, 0.0]])
    out = refine_agent_poses(boxes, init)
    np.testing.assert_array_equal(out, init)
