"""Convert a raw DAIR-V2X-C tree into the normalized schema consumed by
:class:`airv2x_tpu.data.dair_dataset.DAIRDataset`.

Behavioural twin of the reference's on-the-fly calib chain
(data_utils/datasets/dair/intermediate_fusion_dataset.py:320-407 and
utils/transformation_utils.py:109-134, 449-495):

  * vehicle lidar pose  = tfm_to_pose(novatel_to_world ∘ lidar_to_novatel)
  * infra  lidar pose   = tfm_to_pose(virtuallidar_to_world + system offset)
  * cooperative labels: ``world_8_points`` corner lists -> world-frame
    {location, rotation, extent} entries (box_utils.py:1243-1260 converts
    corners to centers; we keep labels in world frame and let the dataset
    project into ego).

Usage:
  python -m airv2x_tpu.tools.dair_convert --raw_dir <DAIR-V2X-C root> \
      --out_dir <normalized root> [--split_json co_split.json]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from airv2x_tpu.utils import transforms as tf


def _load_json(path):
    with open(path) as f:
        return json.load(f)


def veh_lidar_to_world(lidar_to_novatel: dict, novatel_to_world: dict) -> np.ndarray:
    """Compose lidar->novatel with novatel->world (muilt_coord twin,
    transformation_utils.py:449-459)."""
    r_ab = np.asarray(lidar_to_novatel["transform"]["rotation"], np.float64).reshape(3, 3)
    t_ab = np.asarray(lidar_to_novatel["transform"]["translation"], np.float64).reshape(3)
    r_bc = np.asarray(novatel_to_world["rotation"], np.float64).reshape(3, 3)
    t_bc = np.asarray(novatel_to_world["translation"], np.float64).reshape(3)
    T = np.eye(4)
    T[:3, :3] = r_bc @ r_ab
    T[:3, 3] = r_bc @ t_ab + t_bc
    return T


def inf_lidar_to_world(virtuallidar_to_world: dict, offset=None) -> np.ndarray:
    """virtuallidar->world plus the dataset's system error offset
    (transformation_utils.py:482-495)."""
    T = np.eye(4)
    T[:3, :3] = np.asarray(virtuallidar_to_world["rotation"], np.float64).reshape(3, 3)
    t = np.asarray(virtuallidar_to_world["translation"], np.float64).reshape(3)
    if offset:
        t[0] += float(offset.get("delta_x", 0.0))
        t[1] += float(offset.get("delta_y", 0.0))
    T[:3, 3] = t
    return T


def corners_to_label(corners_world: np.ndarray) -> dict:
    """(8, 3) world corners -> {location, rotation, extent} (world frame).

    Corner order follows the reference template (box_utils corner_to_center):
    bottom face 0-3, top face 4-7, with edge 0-1 along the box length.
    """
    c = np.asarray(corners_world, np.float64)
    center = c.mean(axis=0)
    length = float(np.linalg.norm(c[1, :2] - c[0, :2]))
    width = float(np.linalg.norm(c[3, :2] - c[0, :2]))
    height = float(c[:, 2].max() - c[:, 2].min())
    d = c[1, :2] - c[0, :2]
    yaw = float(np.arctan2(d[1], d[0]))
    return {
        "location": [float(center[0]), float(center[1]), float(center[2])],
        "rotation": yaw,
        "extent": [length / 2, width / 2, height / 2],
    }


def convert_frame(raw_dir: str, info: dict, out_label_dir: str) -> dict:
    veh_id = os.path.basename(info["vehicle_pointcloud_path"]).split(".")[0]
    inf_id = os.path.basename(info["infrastructure_pointcloud_path"]).split(".")[0]

    l2n = _load_json(
        os.path.join(raw_dir, "vehicle-side/calib/lidar_to_novatel", f"{veh_id}.json")
    )
    n2w = _load_json(
        os.path.join(raw_dir, "vehicle-side/calib/novatel_to_world", f"{veh_id}.json")
    )
    v2w = _load_json(
        os.path.join(
            raw_dir, "infrastructure-side/calib/virtuallidar_to_world", f"{inf_id}.json"
        )
    )
    offset = info.get("system_error_offset")

    veh_pose = tf.world_to_pose(veh_lidar_to_world(l2n, n2w))
    inf_pose = tf.world_to_pose(inf_lidar_to_world(v2w, offset))

    labels_raw = _load_json(os.path.join(raw_dir, info["cooperative_label_path"]))
    labels = [
        corners_to_label(obj["world_8_points"])
        for obj in labels_raw
        if "world_8_points" in obj
    ]
    label_rel = os.path.join("cooperative", f"label_{veh_id}.json")
    with open(os.path.join(out_label_dir, f"label_{veh_id}.json"), "w") as f:
        json.dump(labels, f)

    return {
        "vehicle_pointcloud_path": info["vehicle_pointcloud_path"],
        "infrastructure_pointcloud_path": info["infrastructure_pointcloud_path"],
        "vehicle_lidar_pose": veh_pose,
        "infrastructure_lidar_pose": inf_pose,
        "cooperative_label_path": label_rel,
    }


def convert(raw_dir: str, out_dir: str, split: list | None = None) -> int:
    frames = _load_json(os.path.join(raw_dir, "cooperative/data_info.json"))
    if split is not None:
        keep = set(split)
        frames = [
            f
            for f in frames
            if os.path.basename(f["vehicle_pointcloud_path"]).split(".")[0] in keep
        ]
    out_label_dir = os.path.join(out_dir, "cooperative")
    os.makedirs(out_label_dir, exist_ok=True)
    out_frames = [convert_frame(raw_dir, info, out_label_dir) for info in frames]
    with open(os.path.join(out_dir, "cooperative", "data_info.json"), "w") as f:
        json.dump(out_frames, f, indent=1)
    return len(out_frames)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--raw_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--split_json", default="", help="json list of frame ids")
    opt = p.parse_args()
    split = _load_json(opt.split_json) if opt.split_json else None
    n = convert(opt.raw_dir, opt.out_dir, split)
    print(f"converted {n} frames -> {opt.out_dir}")


if __name__ == "__main__":
    main()
