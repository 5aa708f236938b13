import json
import os

import numpy as np

from airv2x_tpu.config import load_yaml
from airv2x_tpu.data.dair_dataset import DAIRDataset
from airv2x_tpu.data.pcd import write_pcd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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


def _make_raw_dair_fixture(root):
    """Raw DAIR-V2X layout: calib jsons + pcds + world_8_points labels +
    a camera image per side."""
    import json

    from PIL import Image

    from airv2x_tpu.data.pcd import write_pcd

    rng = np.random.default_rng(3)

    def jdump(rel, obj):
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as f:
            json.dump(obj, f)

    def rotz(deg):
        r = np.radians(deg)
        c, s = np.cos(r), np.sin(r)
        return [[c, -s, 0], [s, c, 0], [0, 0, 1]]

    # vehicle chain: lidar->novatel (identity-ish) . novatel->world
    jdump("vehicle-side/calib/lidar_to_novatel/000001.json",
          {"transform": {"rotation": rotz(0),
                         "translation": [[0.5], [0.0], [1.0]]}})
    jdump("vehicle-side/calib/novatel_to_world/000001.json",
          {"rotation": rotz(30), "translation": [[100.0], [50.0], [0.0]]})
    jdump("infrastructure-side/calib/virtuallidar_to_world/000007.json",
          {"rotation": rotz(90), "translation": [[110.0], [60.0], [1.0]]})
    jdump("vehicle-side/calib/lidar_to_camera/000001.json",
          {"rotation": rotz(-90), "translation": [[0.1], [0.0], [0.5]]})
    jdump("vehicle-side/calib/camera_intrinsic/000001.json",
          {"cam_K": [400.0, 0, 320.0, 0, 400.0, 240.0, 0, 0, 1]})

    for rel in ("vehicle-side/velodyne/000001.pcd",
                "infrastructure-side/velodyne/000007.pcd"):
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        pts = rng.uniform(-20, 20, (256, 4)).astype(np.float32)
        pts[:, 2] = rng.uniform(-1.5, 0.5, 256)
        write_pcd(p, pts)

    img = Image.fromarray(
        rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
    )
    os.makedirs(os.path.join(root, "vehicle-side/image"), exist_ok=True)
    img.save(os.path.join(root, "vehicle-side/image/000001.jpg"))

    # one object as world-frame corners near the vehicle
    veh_world = np.array(
        [[np.cos(np.radians(30)), -np.sin(np.radians(30)), 0],
         [np.sin(np.radians(30)), np.cos(np.radians(30)), 0],
         [0, 0, 1.0]]
    )
    center_lidar = np.array([8.0, 2.0, 0.0])
    center_world = veh_world @ (center_lidar + [0.5, 0, 1.0]) + [100, 50, 0]
    l, w, h = 4.0, 1.8, 1.5
    corners = []
    for dz in (0, h):
        for dx, dy in ((l/2, -w/2), (l/2, w/2), (-l/2, w/2), (-l/2, -w/2)):
            corners.append((center_world + veh_world @ [dx, dy, dz]).tolist())
    corners = [corners[i] for i in (0, 1, 2, 3, 4, 5, 6, 7)]
    jdump("cooperative/label/000001.json",
          [{"world_8_points": corners}])
    jdump("cooperative/data_info.json", [{
        "vehicle_pointcloud_path": "vehicle-side/velodyne/000001.pcd",
        "infrastructure_pointcloud_path":
            "infrastructure-side/velodyne/000007.pcd",
        "vehicle_image_path": "vehicle-side/image/000001.jpg",
        "cooperative_label_path": "cooperative/label/000001.json",
        "system_error_offset": {"delta_x": 1.0, "delta_y": -2.0},
    }])
    return root


def test_raw_dair_calib_chain_golden(tmp_path):
    """Raw calib-chain pose math vs the reference's own converters."""
    from tests.reference_stubs import install_reference_stubs

    install_reference_stubs()
    from opencood.utils import transformation_utils as rtf

    from airv2x_tpu.data import dair_dataset as dd

    l2n = {"transform": {"rotation": [[0, -1, 0], [1, 0, 0], [0, 0, 1]],
                         "translation": [[0.5], [0.2], [1.0]]}}
    n2w = {"rotation": [[1, 0, 0], [0, 0, -1], [0, 1, 0]],
           "translation": [[10.0], [20.0], [3.0]]}
    np.testing.assert_allclose(
        dd.veh_lidar_to_world(l2n, n2w),
        rtf.veh_side_rot_and_trans_to_trasnformation_matrix(
            {"transform": {k: [list(r) for r in v] if k == "rotation" else v
                           for k, v in l2n["transform"].items()}}, n2w
        ),
        atol=1e-12,
    )
    v2w = {"rotation": [[0, 1, 0], [-1, 0, 0], [0, 0, 1]],
           "translation": [[5.0], [6.0], [7.0]]}
    off = {"delta_x": 1.5, "delta_y": -0.5}
    import copy as _copy

    np.testing.assert_allclose(
        dd.inf_lidar_to_world(_copy.deepcopy(v2w), off),
        rtf.inf_side_rot_and_trans_to_trasnformation_matrix(
            {"rotation": v2w["rotation"],
             "translation": [[5.0], [6.0], [7.0]]}, off
        ),
        atol=1e-12,
    )
    l2c = {"rotation": [[0, -1, 0], [0, 0, -1], [1, 0, 0]],
           "translation": [[0.1], [0.2], [0.3]]}
    np.testing.assert_allclose(
        dd.camera_to_lidar_matrix(l2c),
        np.linalg.inv(rtf.rot_and_trans_to_trasnformation_matrix(l2c)),
        atol=1e-12,
    )


def test_raw_dair_dataset_with_camera(tmp_path):
    root = _make_raw_dair_fixture(str(tmp_path))
    hypes = load_yaml(os.path.join(REPO, "hypes_yaml/dair-v2x/dair_attfuse.yaml"))
    hypes["preprocess"]["max_points"] = 2048
    hypes["model"]["args"]["vehicle"] = {
        "cam": {
            "grid_conf": {
                "xbound": [-19.2, 19.2, 0.4],
                "ybound": [-19.2, 19.2, 0.4],
                "zbound": [-10, 10, 20.0],
                "ddiscr": [2, 50, 8],
                "mode": "LID",
            },
            "data_aug_conf": {"final_dim": [64, 96]},
            "img_downsample": 8,
            "img_features": 16,
            "bevout_feature": 16,
            "camera_encoder": "EfficientNet",
            "use_depth_gt": False,
            "depth_supervision": False,
        }
    }
    ds = DAIRDataset(hypes, root, train=False)
    assert len(ds) == 1
    batch, gt = ds[0]
    assert batch["points_mask"][0].any() and batch["points_mask"][1].any()
    # the raw label round-trips the calib chain: center ~ (8, 2) in the
    # vehicle lidar frame
    box = gt["boxes"][gt["mask"]][0]
    np.testing.assert_allclose(box[:2], [8.0, 2.0], atol=0.05)
    np.testing.assert_allclose(box[3:6], [1.5, 1.8, 4.0], atol=0.05)  # hwl
    # camera inputs assembled from the calib chain
    cam = batch["cam_vehicle"]
    assert cam["imgs"].shape == (2, 1, 64, 96, 3)
    np.testing.assert_allclose(cam["intrinsics"][0, 0, 0, 0], 400.0)
    # rots = camera->lidar rotation (inverse of lidar_to_camera rotz(-90))
    np.testing.assert_allclose(
        cam["rots"][0, 0], np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]]),
        atol=1e-5,
    )
