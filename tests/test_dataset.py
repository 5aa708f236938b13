"""On-disk dataset pipeline tests with a generated mini fixture."""

import os
import pickle

import numpy as np
import pytest

from airv2x_tpu.config import load_yaml
from airv2x_tpu.data.airv2x_dataset import AirV2XDataset, WildSettings
from airv2x_tpu.data.pcd import read_pcd, write_pcd
from airv2x_tpu.utils import transforms as tf

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pcd_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(100, 4)).astype(np.float32)
    for binary in (True, False):
        p = tmp_path / f"t_{binary}.pcd"
        write_pcd(str(p), pts, binary=binary)
        back = read_pcd(str(p))
        np.testing.assert_allclose(back, pts, atol=1e-5)


from tests.fixture_utils import (
    FIXTURE_CAM_TO_LIDAR,
    FIXTURE_DEPTH_M,
    FIXTURE_SEG_HW,
    cam_hypes,
    make_fixture as _make_fixture,
)


def test_dataset_walk_and_sample(tmp_path):
    root = _make_fixture(str(tmp_path))
    hypes = load_yaml(os.path.join(REPO, "hypes_yaml/test/tiny_where2comm.yaml"))
    hypes["preprocess"]["max_points"] = 2048
    ds = AirV2XDataset(hypes, root, train=False)
    assert len(ds) == 2

    batch, gt = ds[0]
    L = ds.layout.total
    assert batch["points"].shape == (L, 2048, 4)
    # ego (slot 0) + second vehicle + rsu + drone
    assert batch["agent_mask"][0]
    assert batch["agent_mask"].sum() == 4
    # ego has points, projected and in-range
    assert batch["points_mask"][0].sum() > 0
    lr = hypes["preprocess"]["cav_lidar_range"]
    pts = batch["points"][0][batch["points_mask"][0]]
    assert (pts[:, 0] > lr[0]).all() and (pts[:, 0] < lr[3]).all()
    # rsu prior flag
    rsu_slot = ds.layout.slots("rsu").start
    assert batch["prior_encoding"][rsu_slot, 2] == 1.0

    # object near x=20 world -> relative to ego1 at (10, 5): ~(10, -5)
    assert gt["mask"].sum() == 1
    box = gt["boxes"][gt["mask"]][0]
    assert abs(box[0] - 10.0) < 1.5 and abs(box[1] + 5.0) < 1.5
    assert gt["classes"][gt["mask"]][0] == 2
    # hwl order: h < w < l for this car-like extent
    assert box[3] < box[4] < box[5]


def test_dataset_ego_frame_projection(tmp_path):
    """A world-fixed object must land at consistent ego-frame coords."""
    root = _make_fixture(str(tmp_path))
    hypes = load_yaml(os.path.join(REPO, "hypes_yaml/test/tiny_where2comm.yaml"))
    hypes["preprocess"]["max_points"] = 2048
    ds = AirV2XDataset(hypes, root, train=False)
    _, gt0 = ds[0]
    _, gt1 = ds[1]
    np.testing.assert_allclose(
        gt0["boxes"][gt0["mask"]], gt1["boxes"][gt1["mask"]], atol=1e-5
    )


def test_dataset_velocity_prior(tmp_path):
    """prior_encoding[:, 0] = odometry ego_speed / 30
    (ref intermediate_fusion_dataset.py:222)."""
    root = _make_fixture(str(tmp_path), ego_speed=18.0)
    hypes = load_yaml(os.path.join(REPO, "hypes_yaml/test/tiny_where2comm.yaml"))
    hypes["preprocess"]["max_points"] = 512
    ds = AirV2XDataset(hypes, root, train=False)
    batch, _ = ds[0]
    vel = batch["prior_encoding"][batch["agent_mask"], 0]
    np.testing.assert_allclose(vel, 18.0 / 30.0, atol=1e-6)


def test_dataset_camera_loading(tmp_path):
    """Cameras + CARLA depth decoded from disk with LSS-axes extrinsics
    (ref get_item_single_car :490-583, camera_utils.ue4_to_lss :553)."""
    root = _make_fixture(str(tmp_path), with_camera=True)
    hypes = load_yaml(os.path.join(REPO, "hypes_yaml/test/tiny_where2comm.yaml"))
    hypes["preprocess"]["max_points"] = 512
    hypes = cam_hypes(hypes, types=("vehicle", "rsu"))
    ds = AirV2XDataset(hypes, root, train=False)
    batch, _ = ds[0]

    L = ds.layout.total
    cam = batch["cam_vehicle"]
    # 2 fixture cameras, eval aug: final_dim (32, 48), rgb + depth channel
    assert cam["imgs"].shape == (L, 2, 32, 48, 4)
    assert "cam_rsu" in batch and batch["cam_rsu"]["imgs"].shape[1] == 2
    assert "cam_drone" not in batch

    # depth channel: constant 20 m (quantized through the 16-bit round trip)
    d = cam["imgs"][0, 0, :, :, 3]
    np.testing.assert_allclose(d, FIXTURE_DEPTH_M, atol=0.05)
    # rgb normalized: imagenet stats -> values roughly in [-3, 3]
    assert np.abs(cam["imgs"][..., :3]).max() < 4.0

    # extrinsics: rots/trans reproduce the known cam->lidar matrix
    np.testing.assert_allclose(
        cam["rots"][0, 0], FIXTURE_CAM_TO_LIDAR[:3, :3], atol=1e-5
    )
    np.testing.assert_allclose(
        cam["trans"][0, 0], FIXTURE_CAM_TO_LIDAR[:3, 3], atol=1e-5
    )
    # post homography: eval mode resize 0.5, no crop offset
    np.testing.assert_allclose(
        cam["post_rots"][0, 0][:2, :2], np.eye(2) * 0.5, atol=1e-6
    )
    # empty slots keep identity rotations
    empty = (~batch["agent_mask"]).nonzero()[0]
    if len(empty):
        s = ds.layout.slots("vehicle")
        empty_veh = [i for i in empty if s.start <= i < s.stop]
        for i in empty_veh:
            np.testing.assert_allclose(cam["rots"][i, 0], np.eye(3))


def test_dataset_seg_labels(tmp_path):
    """7+3 seg maps -> dynamic/static class-id maps with the reference's
    threshold + transpose + flip (basedataset.py:885-936)."""
    root = _make_fixture(str(tmp_path), with_seg=True)
    hypes = load_yaml(os.path.join(REPO, "hypes_yaml/test/tiny_where2comm.yaml"))
    hypes["preprocess"]["max_points"] = 512
    hypes["task"] = "seg"
    ds = AirV2XDataset(hypes, root, train=False)
    batch, _ = ds[0]
    dyn = batch["dynamic_seg_label"]
    sta = batch["static_seg_label"]
    s = FIXTURE_SEG_HW
    assert dyn.shape == (s, s) and sta.shape == (s, s)
    # fixture stripe i occupies rows 4i..4i+4, cols :s//2 in image space;
    # after label_map.T[:, ::-1] that block is at [: s//2, s-4i-4 : s-4i]
    for i in range(1, 7):
        block = dyn[: s // 2, s - 4 * i - 4 : s - 4 * i]
        assert (block == i).all(), f"layer {i} misplaced"
    assert set(np.unique(sta)) <= {0, 1, 2}


def test_dataset_loc_noise_changes_pairwise(tmp_path):
    root = _make_fixture(str(tmp_path))
    hypes = load_yaml(os.path.join(REPO, "hypes_yaml/test/tiny_where2comm.yaml"))
    hypes["preprocess"]["max_points"] = 1024
    hypes["fusion"]["args"]["proj_first"] = False
    ds_clean = AirV2XDataset(hypes, root, train=False)
    ds_noisy = AirV2XDataset(
        hypes, root, train=False,
        wild=WildSettings(loc_error=True, xyz_std=0.5, ryp_std=0.5),
    )
    b0, _ = ds_clean[0]
    b1, _ = ds_noisy[0]
    # ego transform unaffected, at least one non-ego transform perturbed
    np.testing.assert_allclose(b0["pairwise_t"][0], b1["pairwise_t"][0])
    assert not np.allclose(b0["pairwise_t"], b1["pairwise_t"])
