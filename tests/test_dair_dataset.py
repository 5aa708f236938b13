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
