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


def _make_fixture(root, n_timestamps=2, rng=None):
    """Create a mini AirV2X-format dataset: 2 vehicles + 1 rsu + 1 object."""
    rng = rng or np.random.default_rng(0)
    scen = os.path.join(root, "2025_01_01_00_00_00")
    agent_specs = {
        1: ("vehicle", [10.0, 5.0, 0.0, 0, 0, 0]),
        2: ("vehicle", [30.0, -5.0, 0.0, 0, 30.0, 0]),
        3: ("rsu", [50.0, 0.0, 4.0, 0, 90.0, 0]),
        4: ("drone", [0.0, 20.0, 60.0, 0, 0, 0]),
    }
    for t in range(n_timestamps):
        tdir = os.path.join(scen, f"timestamp_{t:06d}")
        for aid, (atype, pose) in agent_specs.items():
            adir = os.path.join(tdir, f"agent_{aid:06d}")
            os.makedirs(adir, exist_ok=True)
            meta = {
                "agent_type": atype,
                "odometry": {"ego_pos": list(pose)},
                "lidar": {"lidar_pose": [0.0, 0.0, 1.9, 0, 0, 0]},
            }
            with open(os.path.join(adir, "metadata.pkl"), "wb") as f:
                pickle.dump(meta, f)
            # a small cloud around the agent (world frame shifted to sensor frame)
            pts = rng.normal(scale=10.0, size=(500, 4)).astype(np.float32)
            pts[:, 2] = rng.uniform(-1.5, 0.5, 500) - 1.9
            pts[:, 3] = rng.uniform(0, 1, 500)
            write_pcd(os.path.join(adir, "lidar.pcd"), pts)
        objects = {
            77: {
                "class": 2,
                "location": [20.0, 0.0, 0.4, 0, 15.0, 0],
                "center": [0.0, 0.0, 0.0],
                "extent": [2.0, 0.9, 0.8],
            },
            # a far-away object outside range
            78: {
                "class": 1,
                "location": [500.0, 0.0, 0.4, 0, 0, 0],
                "center": [0.0, 0.0, 0.0],
                "extent": [2.0, 0.9, 0.8],
            },
        }
        with open(os.path.join(tdir, "objects.pkl"), "wb") as f:
            pickle.dump(objects, f)
    return root


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
