"""BEV-structure-aware keypoint subsampling (host-side, numpy).

Twin of the reference's keypoint utilities (utils/keypoint_utils.py:13-200 +
utils/subsampling_utils.py:179-230): project the cloud to a BEV occupancy
image, keep points lying on structural edges, and pad with farthest-point
samples to a fixed budget. The reference detects structure with cv2 Canny +
probabilistic Hough lines; this twin uses a dependency-free occupancy
gradient (a 4-neighborhood boundary test), which keeps the same "prefer
points on object boundaries" behavior without OpenCV. All loops are
vectorized — the reference's per-point / per-voxel Python loops
(keypoint_utils.py:66-73, 126-146) are replaced with bincount / isin.
"""

from __future__ import annotations

import numpy as np


def mask_points_by_range(points, limit_range, return_mask=False):
    """keypoint_utils.py:13-36: crop to a 4- or 6-element range."""
    p = np.asarray(points)
    if len(limit_range) == 6:
        x0, y0, z0, x1, y1, z1 = limit_range
        mask = (
            (p[:, 0] > x0) & (p[:, 0] < x1)
            & (p[:, 1] > y0) & (p[:, 1] < y1)
            & (p[:, 2] > z0) & (p[:, 2] < z1)
        )
    else:
        x0, y0, x1, y1 = limit_range
        mask = (
            (p[:, 0] > x0) & (p[:, 0] < x1)
            & (p[:, 1] > y0) & (p[:, 1] < y1)
        )
    return (p[mask], mask) if return_mask else p[mask]


def project_bev(pcd, lidar_range, voxel_size):
    """keypoint_utils.py:39-78 vectorized: (H, W) occupancy image + per-point
    flat cell index (y_idx * W + x_idx, computed for every point; only
    in-range points light up the image)."""
    p = np.asarray(pcd)[:, :3]
    x0, y0, _, x1, y1, _ = lidar_range
    h = round((y1 - y0) / voxel_size)
    w = round((x1 - x0) / voxel_size)
    _, mask = mask_points_by_range(p, lidar_range, return_mask=True)
    yi = ((p[:, 1] - y0) / voxel_size).astype(np.int64)
    xi = ((p[:, 0] - x0) / voxel_size).astype(np.int64)
    cell = yi * w + xi
    bev = np.zeros((h, w), np.uint8)
    ok = mask & (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    bev.reshape(-1)[np.unique(cell[ok])] = 255
    with_idx = np.concatenate([p, cell[:, None].astype(p.dtype)], axis=1)
    return bev, with_idx


def occupancy_edges(bev):
    """Structural-edge mask: occupied cells with at least one empty
    4-neighbor (stands in for Canny+Hough of keypoint_utils.py:81-113)."""
    occ = bev > 0
    pad = np.pad(occ, 1)
    full = (
        pad[:-2, 1:-1] & pad[2:, 1:-1] & pad[1:-1, :-2] & pad[1:-1, 2:]
    )
    return occ & ~full


def farthest_point_sampling(points, n_samples, rng=None):
    """subsampling_utils.py 'farthest' mode: iterative FPS from a random
    seed point (vectorized distance update)."""
    p = np.asarray(points)[:, :3]
    n = p.shape[0]
    if n_samples >= n:
        return np.asarray(points)
    rng = rng or np.random.default_rng()
    sel = np.empty(n_samples, np.int64)
    sel[0] = rng.integers(n)
    d = np.linalg.norm(p - p[sel[0]], axis=1)
    for i in range(1, n_samples):
        sel[i] = int(np.argmax(d))
        d = np.minimum(d, np.linalg.norm(p - p[sel[i]], axis=1))
    return np.asarray(points)[sel]


def get_random_subset(pc, num_samples, mode="farthest", rng=None):
    """subsampling_utils.py:179-206 (uniform + farthest modes)."""
    pc = np.asarray(pc)
    if num_samples >= pc.shape[0]:
        return pc
    rng = rng or np.random.default_rng()
    if mode == "uniform":
        return pc[rng.permutation(pc.shape[0])[:num_samples]]
    return farthest_point_sampling(pc, num_samples, rng)


def get_keypoints(pcd_all, pcd_select, n_samples, mode="farthest", rng=None):
    """keypoint_utils.py:153-162: subsample the structure points if there
    are enough, else top up from the full cloud."""
    pcd_select = np.asarray(pcd_select)
    if pcd_select.shape[0] >= n_samples:
        return get_random_subset(pcd_select, n_samples, mode, rng)
    extra = get_random_subset(
        pcd_all, n_samples - pcd_select.shape[0], mode, rng
    )
    return np.concatenate([extra[:, : pcd_select.shape[1]], pcd_select], 0)


def bev_sample(pcd, lidar_range, n_samples, mode="farthest", voxel_size=0.2,
               all_samples=False, rng=None):
    """keypoint_utils.py:165-200: BEV-structure-preferring keypoint set."""
    p = np.asarray(pcd)[:, :3]
    bev, with_idx = project_bev(p, lidar_range, voxel_size)
    edges = occupancy_edges(bev)
    rows, cols = np.nonzero(edges)
    w = bev.shape[1]
    edge_cells = rows.astype(np.int64) * w + cols.astype(np.int64)
    on_edge = np.isin(with_idx[:, 3].astype(np.int64), edge_cells)
    points_select = p[on_edge]
    if all_samples:
        return points_select
    return get_keypoints(p, points_select, n_samples, mode, rng)
