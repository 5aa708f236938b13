"""DAIR-V2X vehicle+infrastructure dataset adapter (host pipeline).

Structure twin of data_utils/datasets/dair/intermediate_fusion_dataset.py:
a fixed 2-agent setup (max_cav = 2: ego vehicle + one roadside unit), frames
indexed by ``cooperative/data_info.json``, with per-frame point clouds,
6-DoF lidar poses and a cooperative 3D-box label file.

This adapter consumes a *normalized* frame-info schema (the fields the
reference derives from DAIR's raw calib chain — see camera_basedataset
_init_database :705-740):

    {"vehicle_pointcloud_path": ..., "infrastructure_pointcloud_path": ...,
     "vehicle_lidar_pose": [x y z roll yaw pitch],
     "infrastructure_lidar_pose": [...],
     "cooperative_label_path": ...}

and labels as a json list of {"location": [x y z] (world),
"rotation": yaw, "extent": [half_l half_w half_h]} — raw-DAIR calib-chain
derivation (virtuallidar->world etc.) can be layered on top as a converter.
"""

from __future__ import annotations

import json
import os

import numpy as np

from airv2x_tpu.models.base import SlotLayout
from airv2x_tpu.utils import transforms as tf


def _load_json(path):
    with open(path) as f:
        return json.load(f)


class DAIRDataset:
    def __init__(self, hypes: dict, root_dir: str, train: bool = True,
                 wild=None, seed: int = 0):
        from airv2x_tpu.data.airv2x_dataset import WildSettings

        self.hypes = hypes
        self.train = train
        self.root = root_dir
        self.wild = wild or WildSettings()
        self.seed = seed
        self.layout = SlotLayout(counts=(2, 0, 0))
        self.lidar_range = hypes["preprocess"]["cav_lidar_range"]
        self.max_points = int(hypes["preprocess"].get("max_points", 60000))
        self.max_num = int(hypes["postprocess"]["max_num"])
        self.proj_first = bool(
            hypes.get("fusion", {}).get("args", {}).get("proj_first", True)
        )
        self.clip_pc = bool(
            hypes.get("fusion", {}).get("args", {}).get("clip_pc", False)
        )
        info_path = os.path.join(root_dir, "cooperative", "data_info.json")
        self.frames = _load_json(info_path) if os.path.isfile(info_path) else []

    def __len__(self):
        return len(self.frames)

    def __getitem__(self, idx: int):
        from airv2x_tpu.data.native import load_pcd_into

        info = self.frames[idx]
        veh_pose = info["vehicle_lidar_pose"]
        inf_pose = info["infrastructure_lidar_pose"]
        # wild settings: gaussian localization noise on the infrastructure
        # pose (the reference's dair basedataset loc_err path — the ego
        # vehicle stays clean)
        if self.wild.loc_error:
            rng = np.random.default_rng((self.seed, idx))
            inf_pose = tf.add_pose_noise(
                inf_pose, rng, self.wild.xyz_std, self.wild.ryp_std
            )

        L, n = 2, self.max_points
        points = np.zeros((L, n, 4), np.float32)
        points_mask = np.zeros((L, n), bool)
        agent_mask = np.array([True, True])
        pairwise = np.tile(np.eye(4, dtype=np.float32), (L, 1, 1))
        pairwise_full = np.tile(np.eye(4, dtype=np.float32), (L, L, 1, 1))

        poses = [veh_pose, inf_pose]
        keys = ["vehicle_pointcloud_path", "infrastructure_pointcloud_path"]
        transforms = []
        for slot, (pose, key) in enumerate(zip(poses, keys)):
            t_cav_ego = tf.pose_a_to_b(pose, veh_pose)
            transforms.append(t_cav_ego)
            if not self.proj_first:
                pairwise[slot] = t_cav_ego.astype(np.float32)
            path = os.path.join(self.root, info[key])
            if os.path.isfile(path):
                cnt = load_pcd_into(
                    path,
                    points[slot],
                    transform=t_cav_ego.astype(np.float32)
                    if self.proj_first else None,
                    lidar_range=np.asarray(self.lidar_range, np.float32),
                    ego_mask=0.0,
                )
                points_mask[slot, :cnt] = True
        if self.clip_pc:  # reference clip_pc: drop x < 0 (vehicle frame)
            neg = points[..., 0] < 0
            points_mask &= ~neg
        if not self.proj_first:
            for i in range(L):
                for j in range(L):
                    pairwise_full[i, j] = np.linalg.solve(
                        transforms[i], transforms[j]
                    )

        boxes = np.zeros((self.max_num, 7), np.float32)
        classes = np.ones((self.max_num,), np.int32)
        mask = np.zeros((self.max_num,), bool)
        label_path = os.path.join(self.root, info["cooperative_label_path"])
        labels = _load_json(label_path) if os.path.isfile(label_path) else []
        i = 0
        for obj in labels:
            if i >= self.max_num:
                break
            loc = obj["location"]
            yaw = float(obj.get("rotation", 0.0))
            ext = obj["extent"]  # half dims [l/2, w/2, h/2]
            pose = [loc[0], loc[1], loc[2], 0.0, np.degrees(yaw), 0.0]
            o2l = tf.pose_a_to_b(pose, veh_pose)
            cx, cy, cz = o2l[:3, 3]
            lr = self.lidar_range
            if not (lr[0] < cx < lr[3] and lr[1] < cy < lr[4]):
                continue
            c, s = o2l[0, 0], o2l[1, 0]
            yaw_ego = np.arctan2(s, c)
            boxes[i] = [cx, cy, cz, 2 * ext[2], 2 * ext[1], 2 * ext[0], yaw_ego]
            mask[i] = True
            i += 1

        batch = {
            "points": points,
            "points_mask": points_mask,
            "agent_mask": agent_mask,
            "pairwise_t": pairwise,
            "pairwise_t_full": pairwise_full,
            "prior_encoding": np.array(
                [[0, 0, 0], [0, 0, 1]], np.float32
            ),  # infra flag on slot 1
        }
        gt = {"boxes": boxes, "mask": mask, "classes": classes}
        return batch, gt
