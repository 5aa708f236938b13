"""Host-side BEV keypoint subsampling (utils/keypoints.py)."""

import numpy as np

from airv2x_tpu.utils.keypoints import (
    bev_sample,
    farthest_point_sampling,
    get_keypoints,
    mask_points_by_range,
    occupancy_edges,
    project_bev,
)

LR = [-12.8, -12.8, -3, 12.8, 12.8, 3]


def _cloud(rng):
    t = rng.uniform(0, 1, 2000)
    edge = np.stack(
        [
            np.where(t < 0.5, t * 8 - 4, 4.0),
            np.where(t < 0.5, -4.0, t * 8 - 8),
            np.zeros_like(t),
        ],
        1,
    )
    noise = rng.uniform(-10, 10, (500, 3))
    noise[:, 2] = 0
    return np.concatenate([edge + rng.normal(0, 0.02, edge.shape), noise])


def test_project_bev_and_edges(rng):
    pc = _cloud(rng)
    bev, with_idx = project_bev(pc, LR, 0.4)
    assert bev.shape == (64, 64)
    assert bev.max() == 255
    assert with_idx.shape == (pc.shape[0], 4)
    # in-range points index into the image
    inside = mask_points_by_range(pc, LR, return_mask=True)[1]
    cells = with_idx[inside, 3].astype(int)
    assert (bev.reshape(-1)[cells] == 255).all()
    edges = occupancy_edges(bev)
    assert 0 < edges.sum() <= (bev > 0).sum()


def test_fps_spreads(rng):
    pc = _cloud(rng)
    f = farthest_point_sampling(pc, 16, rng)
    sub = pc[rng.permutation(pc.shape[0])[:16]]

    def min_pdist(a):
        d = np.linalg.norm(a[:, None, :] - a[None, :, :], axis=-1)
        return d[~np.eye(len(a), dtype=bool)].min()

    assert min_pdist(f) > min_pdist(sub)


def test_bev_sample_budget_and_topup(rng):
    pc = _cloud(rng)
    kp = bev_sample(pc, LR, 256, rng=rng)
    assert kp.shape == (256, 3)
    # few structure points -> topped up from the full cloud
    few = pc[:5]
    kp2 = get_keypoints(pc, few, 64, rng=rng)
    assert kp2.shape == (64, 3)
    # all_samples returns exactly the edge points
    allkp = bev_sample(pc, LR, 0, all_samples=True, rng=rng)
    assert allkp.shape[0] > 0
