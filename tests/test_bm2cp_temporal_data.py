"""BM2CP lidar-depth-to-image sample assembly + K-frame temporal loading.

Twin coverage for the reference's intermediate_fusion_dataset_bm2cp.py
(lidar projected into each camera as a min-depth-level map) and
intermediate_fusion_dataset_multi_frame_how2comm.py (K-frame samples with
history transforms).
"""

import copy
import os

import numpy as np
import pytest

from airv2x_tpu.config import load_yaml
from airv2x_tpu.data.airv2x_dataset import AirV2XDataset
from airv2x_tpu.data.camera import (
    depth_discretization_np,
    lss_to_ue4,
    project_lidar_depth_map,
)
from tests.fixture_utils import (
    FIXTURE_CAM_TO_LIDAR,
    cam_hypes,
    make_fixture,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_hypes():
    return load_yaml(os.path.join(REPO, "hypes_yaml/test/tiny_where2comm.yaml"))


def test_depth_projection_geometry():
    """A point straight ahead of the camera lands at the principal point
    with the right depth level; behind-camera points are dropped."""
    h, w = 64, 96
    intr = np.array([[w * 0.8, 0, w / 2], [0, w * 0.8, h / 2], [0, 0, 1]])
    extr = lss_to_ue4(FIXTURE_CAM_TO_LIDAR)  # camera at (0.5, 0, 1.5), +x
    dd = depth_discretization_np(2, 50, 8, "LID")

    pts = np.array(
        [
            [10.5, 0.0, 1.5],  # 10 m straight ahead -> principal point
            [-5.0, 0.0, 1.5],  # behind the camera -> dropped
        ],
        np.float32,
    )
    dm = project_lidar_depth_map(pts, intr, extr, (h, w), dd, (h, w))
    assert dm.shape == (h, w)
    expect = max(np.searchsorted(dd, 10.0, side="left"), 1) - 1
    assert dm[h // 2, w // 2] == expect
    assert (dm >= 0).sum() == 1  # only the in-front point rasterized

    # min over points sharing a pixel: add a nearer point on the same ray
    pts2 = np.concatenate([pts, [[5.5, 0.0, 1.5]]]).astype(np.float32)
    dm2 = project_lidar_depth_map(pts2, intr, extr, (h, w), dd, (h, w))
    expect_near = max(np.searchsorted(dd, 5.0, side="left"), 1) - 1
    assert dm2[h // 2, w // 2] == expect_near <= expect


def test_bm2cp_dataset_depth_maps(tmp_path, tiny_hypes):
    root = make_fixture(str(tmp_path / "train"), with_camera=True)
    hypes = cam_hypes(copy.deepcopy(tiny_hypes), types=("vehicle",))
    hypes["fusion"]["core_method"] = "IntermediateFusionDatasetAirv2xBM2CP"
    ds = AirV2XDataset(hypes, root, train=False)
    assert ds.bm2cp
    batch, _ = ds[0]
    dm = batch["cam_vehicle"]["depth_maps"]
    fh, fw = hypes["model"]["args"]["vehicle"]["cam"]["data_aug_conf"][
        "final_dim"
    ]
    L = batch["agent_mask"].shape[0]
    assert dm.shape[0] == L and dm.shape[2:] == (fh, fw)
    veh = batch["agent_mask"].copy()
    veh[2:] = False  # vehicle slots only
    assert (dm[veh] >= 0).any(), "no lidar return projected into any camera"
    # empty agent slots stay at -1, never a valid level-0
    assert (dm[~batch["agent_mask"]] == -1).all()


def test_multiframe_temporal_loading(tmp_path, tiny_hypes):
    root = make_fixture(str(tmp_path / "train"), n_timestamps=3)
    hypes = copy.deepcopy(tiny_hypes)
    hypes["model"]["core_method"] = "point_pillar_scope"
    hypes["model"]["args"]["temporal_fusion"] = {"frames": 2, "channels": 16}
    ds = AirV2XDataset(hypes, root, train=False)
    assert ds.frames == 2

    batch, gt = ds[2]  # t=2 -> frames (1, 2)
    L = ds.layout.total
    n = ds.max_points
    assert batch["points"].shape == (2, L, n, 4)
    assert batch["points_mask"].shape == (2, L, n)
    assert batch["agent_mask"].shape == (2, L)
    assert batch["history_t"].shape == (2, 4, 4)
    # current frame maps to itself
    np.testing.assert_allclose(batch["history_t"][-1], np.eye(4), atol=1e-6)
    assert gt["mask"].any()

    # first sample clamps history at the scenario start
    batch0, _ = ds[0]
    assert batch0["points"].shape == (2, L, n, 4)
