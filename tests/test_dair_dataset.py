import json
import os

import numpy as np

from airv2x_tpu.data.dair_dataset import DAIRDataset
from airv2x_tpu.data.pcd import write_pcd


def _hypes():
    return {
        "preprocess": {
            "cav_lidar_range": [-40, -40, -3, 40, 40, 1],
            "args": {"voxel_size": [0.4, 0.4, 4]},
            "max_points": 1024,
        },
        "postprocess": {"max_num": 20},
        "fusion": {"args": {"proj_first": True, "clip_pc": False}},
    }


def _fixture(root, rng):
    os.makedirs(os.path.join(root, "cooperative"), exist_ok=True)
    os.makedirs(os.path.join(root, "velodyne"), exist_ok=True)
    pts = rng.normal(scale=15.0, size=(300, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-1.5, 0.0, 300)
    write_pcd(os.path.join(root, "velodyne", "veh.pcd"), pts)
    write_pcd(os.path.join(root, "velodyne", "inf.pcd"), pts)
    labels = [
        {"location": [15.0, 7.0, 0.0], "rotation": 0.3,
         "extent": [2.2, 0.9, 0.75]},
        {"location": [500.0, 0.0, 0.0], "rotation": 0.0,
         "extent": [2.2, 0.9, 0.75]},
    ]
    with open(os.path.join(root, "cooperative", "label.json"), "w") as f:
        json.dump(labels, f)
    info = [
        {
            "vehicle_pointcloud_path": "velodyne/veh.pcd",
            "infrastructure_pointcloud_path": "velodyne/inf.pcd",
            "vehicle_lidar_pose": [5.0, 2.0, 1.9, 0, 0, 0],
            "infrastructure_lidar_pose": [25.0, -3.0, 6.0, 0, 90.0, 0],
            "cooperative_label_path": "cooperative/label.json",
        }
    ]
    with open(os.path.join(root, "cooperative", "data_info.json"), "w") as f:
        json.dump(info, f)
    return root


def test_dair_sample(tmp_path, rng):
    root = _fixture(str(tmp_path), rng)
    ds = DAIRDataset(_hypes(), root, train=False)
    assert len(ds) == 1
    batch, gt = ds[0]
    assert batch["points"].shape == (2, 1024, 4)
    assert batch["agent_mask"].tolist() == [True, True]
    assert batch["points_mask"].sum() > 0
    assert batch["prior_encoding"][1, 2] == 1.0  # infra flag
    assert gt["mask"].sum() == 1
    box = gt["boxes"][gt["mask"]][0]
    # world (15, 7) relative to veh (5, 2) -> (10, 5)
    assert abs(box[0] - 10.0) < 0.5 and abs(box[1] - 5.0) < 0.5
    assert abs(box[6] - 0.3) < 1e-3


def _box_corners_world(center, yaw, half_lwh):
    l, w, h = half_lwh
    local = np.array([
        [-l, -w, -h], [l, -w, -h], [l, w, -h], [-l, w, -h],
        [-l, -w, h], [l, -w, h], [l, w, h], [-l, w, h],
    ])
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    return (local @ R.T) + np.asarray(center)


def _raw_fixture(root, rng):
    """Minimal raw DAIR-V2X-C tree: calib chain + world_8_points labels."""
    for d in ("cooperative", "velodyne",
              "vehicle-side/calib/lidar_to_novatel",
              "vehicle-side/calib/novatel_to_world",
              "infrastructure-side/calib/virtuallidar_to_world"):
        os.makedirs(os.path.join(root, d), exist_ok=True)
    pts = rng.normal(scale=15.0, size=(200, 4)).astype(np.float32)
    write_pcd(os.path.join(root, "velodyne", "000001.pcd"), pts)
    write_pcd(os.path.join(root, "velodyne", "000009.pcd"), pts)

    # vehicle: lidar->novatel identity; novatel->world translate (5, 2, 1.9)
    json.dump({"transform": {"rotation": np.eye(3).tolist(),
                             "translation": [[0.0], [0.0], [0.0]]}},
              open(os.path.join(root, "vehicle-side/calib/lidar_to_novatel/000001.json"), "w"))
    json.dump({"rotation": np.eye(3).tolist(),
               "translation": [[5.0], [2.0], [1.9]]},
              open(os.path.join(root, "vehicle-side/calib/novatel_to_world/000001.json"), "w"))
    # infra: rotated 90deg about z, translated; system offset corrects +1, -1
    th = np.pi / 2
    R = [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    json.dump({"rotation": R, "translation": [[24.0], [-2.0], [6.0]]},
              open(os.path.join(root,
                   "infrastructure-side/calib/virtuallidar_to_world/000009.json"), "w"))

    # one in-range cooperative object at world (15, 7), yaw 0.3
    corners = _box_corners_world([15.0, 7.0, 0.0], 0.3, [2.2, 0.9, 0.75])
    json.dump([{"world_8_points": corners.tolist()}],
              open(os.path.join(root, "cooperative", "raw_label_000001.json"), "w"))
    json.dump([{
        "vehicle_pointcloud_path": "velodyne/000001.pcd",
        "infrastructure_pointcloud_path": "velodyne/000009.pcd",
        "cooperative_label_path": "cooperative/raw_label_000001.json",
        "system_error_offset": {"delta_x": 1.0, "delta_y": -1.0},
    }], open(os.path.join(root, "cooperative", "data_info.json"), "w"))
    return root


def test_dair_raw_convert_roundtrip(tmp_path, rng):
    from airv2x_tpu.tools.dair_convert import convert

    raw = _raw_fixture(str(tmp_path / "raw"), rng)
    out = str(tmp_path / "norm")
    n = convert(raw, out)
    assert n == 1

    info = json.load(open(os.path.join(out, "cooperative", "data_info.json")))[0]
    assert np.allclose(info["vehicle_lidar_pose"][:3], [5.0, 2.0, 1.9])
    # infra pose: translation + offset, yaw 90deg
    assert np.allclose(info["infrastructure_lidar_pose"][:3], [25.0, -3.0, 6.0])
    assert abs(info["infrastructure_lidar_pose"][4] - 90.0) < 1e-6

    # point clouds live in the raw tree; copy refs for the dataset walker
    os.makedirs(os.path.join(out, "velodyne"), exist_ok=True)
    for f in ("000001.pcd", "000009.pcd"):
        with open(os.path.join(raw, "velodyne", f), "rb") as src, \
             open(os.path.join(out, "velodyne", f), "wb") as dst:
            dst.write(src.read())

    ds = DAIRDataset(_hypes(), out, train=False)
    batch, gt = ds[0]
    assert gt["mask"].sum() == 1
    box = gt["boxes"][gt["mask"]][0]
    # world (15, 7) relative to vehicle at (5, 2) -> ego (10, 5)
    assert abs(box[0] - 10.0) < 0.5 and abs(box[1] - 5.0) < 0.5
    assert abs(box[6] - 0.3) < 1e-2
    # hwl order: h=1.5, w=1.8, l=4.4
    assert np.allclose(box[3:6], [1.5, 1.8, 4.4], atol=0.05)
