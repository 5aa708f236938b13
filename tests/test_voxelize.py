import jax.numpy as jnp
import numpy as np

from airv2x_tpu.ops.scatter import scatter_pillars_to_bev
from airv2x_tpu.ops.voxelize import pillarize

RANGE = jnp.array([-2.0, -2.0, -1.0, 2.0, 2.0, 1.0])
VOX = jnp.array([1.0, 1.0, 2.0])
GRID = (4, 4, 1)


def _pillarize(points, mask, p=8, k=4):
    return pillarize(
        jnp.asarray(points, jnp.float32),
        jnp.asarray(mask),
        lidar_range=RANGE,
        voxel_size=VOX,
        grid_size=GRID,
        max_pillars=p,
        max_points_per_pillar=k,
    )


def test_basic_grouping():
    pts = np.array(
        [
            [-1.5, -1.5, 0.0, 1.0],  # cell (0, 0)
            [-1.4, -1.6, 0.0, 2.0],  # cell (0, 0)
            [0.5, 0.5, 0.0, 3.0],  # cell (2, 2)
            [1.5, -0.5, 0.0, 4.0],  # cell (3, 1)
        ]
    )
    out = _pillarize(pts, np.ones(4, bool))
    assert int(out.mask.sum()) == 3
    counts = np.asarray(out.num_points)[np.asarray(out.mask)]
    assert sorted(counts.tolist()) == [1, 1, 2]
    # coords zyx; find the 2-point pillar -> cell x=0, y=0
    m = np.asarray(out.mask)
    two = np.asarray(out.coords)[m][np.asarray(counts) == 2]
    np.testing.assert_array_equal(two[0], [0, 0, 0])


def test_out_of_range_and_padding_dropped():
    pts = np.array(
        [
            [0.5, 0.5, 0.0, 1.0],
            [5.0, 0.0, 0.0, 1.0],  # out of range x
            [0.0, 0.0, 3.0, 1.0],  # out of range z
            [0.6, 0.6, 0.1, 1.0],  # padding (mask False)
        ]
    )
    mask = np.array([True, True, True, False])
    out = _pillarize(pts, mask)
    assert int(out.mask.sum()) == 1
    assert int(out.num_points.sum()) == 1


def test_point_cap_per_pillar():
    pts = np.zeros((10, 4))
    pts[:, :2] = 0.5  # all in one cell
    pts[:, 3] = np.arange(10)
    out = _pillarize(pts, np.ones(10, bool), k=4)
    assert int(out.mask.sum()) == 1
    assert int(out.num_points.max()) == 4
    # stable order: first 4 points kept (spconv truncation parity)
    pillar = np.asarray(out.voxels)[np.asarray(out.mask)][0]
    np.testing.assert_array_equal(pillar[:4, 3], [0, 1, 2, 3])


def test_pillar_cap():
    # 6 distinct cells but max_pillars=4
    pts = np.array(
        [[-1.5 + i, -1.5, 0.0, 1.0] for i in range(4)]
        + [[-1.5 + i, -0.5, 0.0, 1.0] for i in range(2)]
    )
    out = _pillarize(pts, np.ones(len(pts), bool), p=4)
    assert int(out.mask.sum()) == 4
    assert int(out.num_points.sum()) == 4


def test_empty_cloud():
    pts = np.zeros((5, 4))
    out = _pillarize(pts, np.zeros(5, bool))
    assert int(out.mask.sum()) == 0
    assert int(out.num_points.sum()) == 0


def test_scatter_roundtrip():
    pts = np.array(
        [
            [-1.5, -1.5, 0.0, 1.0],
            [0.5, 0.5, 0.0, 3.0],
            [1.5, -0.5, 0.0, 4.0],
        ]
    )
    out = _pillarize(pts, np.ones(3, bool))
    feats = out.num_points[:, None].astype(jnp.float32)  # (P, 1) simple feature
    bev = np.asarray(
        scatter_pillars_to_bev(feats, out.coords, out.mask, ny=4, nx=4)
    )[..., 0]
    assert bev.shape == (4, 4)
    # (y, x) placements: (0,0), (2,2), (1,3)
    assert bev[0, 0] == 1 and bev[2, 2] == 1 and bev[1, 3] == 1
    assert bev.sum() == 3
