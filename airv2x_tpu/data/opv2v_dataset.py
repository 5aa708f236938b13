"""OPV2V / V2X-R on-disk dataset -> fixed-shape batches (host pipeline).

Format twin of data_utils/datasets/opv2v/basedataset.py:148-420:
``root/<scenario>/<cav_id>/<timestamp>.yaml`` (per-frame metadata:
``lidar_pose`` [x y z roll yaw pitch], ``vehicles`` gt dict with
location/angle/center/extent, ``ego_speed``...) plus ``<timestamp>.pcd``
clouds and optionally ``<timestamp>_radar.pcd`` (V2X-R 4D radar).

Produces the same batch contract as the AirV2X pipeline with a homogeneous
(vehicle-only) slot layout; ego = lowest cav id (the reference sorts cav
dirs and treats the first as ego). Gt objects follow
box_utils.project_world_objects (:506-575, ``angle`` key instead of the
AirV2X pose-embedded rotation).
"""

from __future__ import annotations

import os

import numpy as np
import yaml

from airv2x_tpu.models.base import SlotLayout
from airv2x_tpu.utils import transforms as tf

COM_RANGE = 70.0  # OPV2V default communication range (meters)


def _load_yaml(path):
    with open(path) as f:
        return yaml.safe_load(f)


def object_to_ego_box(obj: dict, ego_lidar_pose, lidar_range):
    """OPV2V 'vehicles' entry -> 7-dof hwl box in ego-lidar frame or None."""
    from airv2x_tpu.data.airv2x_dataset import (
        _corner_to_center_hwl,
        _corners_from_extent,
    )

    loc = obj["location"]
    ang = obj["angle"]  # [roll, yaw, pitch]
    center = obj.get("center", [0, 0, 0])
    object_pose = [
        loc[0] + center[0], loc[1] + center[1], loc[2] + center[2],
        ang[0], ang[1], ang[2],
    ]
    obj2lidar = tf.pose_a_to_b(object_pose, ego_lidar_pose)
    corners = _corners_from_extent(obj["extent"])
    corners = corners @ obj2lidar[:3, :3].T + obj2lidar[:3, 3]
    box = _corner_to_center_hwl(corners)
    x, y = box[0], box[1]
    if not (
        lidar_range[0] < x < lidar_range[3] and lidar_range[1] < y < lidar_range[4]
    ):
        return None
    return box


class OPV2VDataset:
    """Index an OPV2V-format split and produce fixed-shape samples."""

    def __init__(self, hypes: dict, split_dir: str, train: bool = True,
                 use_radar: bool = False, seed: int = 0, wild=None):
        from airv2x_tpu.data.airv2x_dataset import WildSettings

        self.hypes = hypes
        self.train = train
        self.use_radar = use_radar
        self.seed = seed
        self.wild = wild or WildSettings()
        max_cav = hypes["train_params"]["max_cav"]
        if isinstance(max_cav, dict):
            max_cav = sum(max_cav.values())
        self.layout = SlotLayout(counts=(int(max_cav), 0, 0))
        self.lidar_range = hypes["preprocess"]["cav_lidar_range"]
        self.max_points = int(hypes["preprocess"].get("max_points", 60000))
        self.max_num = int(hypes["postprocess"]["max_num"])
        self.proj_first = bool(
            hypes.get("fusion", {}).get("args", {}).get("proj_first", True)
        )
        # camera branch (lidar_camera_intermediate_fusion_dataset twin):
        # loads <stamp>_camera{0..3}.png when the model's vehicle config
        # requests the cam modality
        margs = hypes.get("model", {}).get("args", {})
        veh = margs.get("vehicle") if isinstance(margs.get("vehicle"), dict) else {}
        self.cam_conf = (
            veh.get("cam", {}).get("data_aug_conf")
            if "cam" in veh.get("modalities", [])
            else None
        )
        # K-frame temporal samples (SCOPE / How2comm OPV2V families,
        # intermediate_fusion_dataset_multi_frame_how2comm.py:28,93-104)
        core = str(hypes.get("model", {}).get("core_method", "")).lower()
        # MDD training consumes the clean-points twin of each degraded
        # sweep (basedataset.py:350-358: weather label == 0 selects
        # ``de_lidar_np``); surfaced as de_points_mask over the same slots
        self.with_de = "mdd" in core and train
        self.frames = int(
            hypes.get("fusion", {}).get("args", {}).get("num_sweep_frames", 0)
            or (
                hypes.get("model", {}).get("args", {}).get("temporal_fusion", {}).get("frames", 0)
                if any(k in core for k in ("scope", "how2comm"))
                else 0
            )
            or 1
        )

        self.samples = []  # (scenario_path, sorted cav ids, timestamp)
        if os.path.isdir(split_dir):
            for scen in sorted(os.listdir(split_dir)):
                spath = os.path.join(split_dir, scen)
                if not os.path.isdir(spath):
                    continue
                cavs = sorted(
                    d for d in os.listdir(spath)
                    if os.path.isdir(os.path.join(spath, d))
                )
                if not cavs:
                    continue
                stamps = sorted(
                    f[:-5]
                    for f in os.listdir(os.path.join(spath, cavs[0]))
                    if f.endswith(".yaml") and "additional" not in f
                )
                for i in range(len(stamps)):
                    self.samples.append((spath, cavs, stamps, i))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int, epoch: int = 0):
        spath, cavs, stamps, ti = self.samples[idx]
        rng = np.random.default_rng((self.seed, epoch, idx))

        if self.frames <= 1:
            batch, gt, _ = self._assemble(spath, cavs, stamps[ti], rng)
            return batch, gt

        # oldest -> current; frame k's points stay in k's ego frame and
        # history_t carries the k->current ego transform
        ts = [max(ti - k, 0) for k in range(self.frames - 1, -1, -1)]
        frames, poses = [], []
        gt = None
        for k in ts:
            b, g, pose = self._assemble(spath, cavs, stamps[k], rng)
            frames.append(b)
            poses.append(pose)
            gt = g
        batch = {
            key: np.stack([f[key] for f in frames])
            for key in ("points", "points_mask", "agent_mask")
        }
        for key, v in frames[-1].items():
            if key not in batch:
                batch[key] = v
        batch["history_t"] = np.stack(
            [tf.pose_a_to_b(p, poses[-1]).astype(np.float32) for p in poses]
        )
        return batch, gt

    def _assemble(self, spath, cavs, stamp, rng):
        from airv2x_tpu.data.native import load_pcd_into

        metas = {}
        for cav in cavs:
            ypath = os.path.join(spath, cav, f"{stamp}.yaml")
            if os.path.isfile(ypath):
                metas[cav] = _load_yaml(ypath)
        ego_id = cavs[0]
        ego_pose = metas[ego_id]["lidar_pose"]

        # wild settings: gaussian localization noise on non-ego poses
        # (opv2v basedataset wild_setting, like the AirV2X path)
        if self.wild.loc_error:
            for cav in cavs[1:]:
                if cav in metas:
                    metas[cav] = dict(metas[cav])
                    metas[cav]["lidar_pose"] = tf.add_pose_noise(
                        metas[cav]["lidar_pose"], rng,
                        self.wild.xyz_std, self.wild.ryp_std,
                    )

        # comm-range gate + nearest-k
        chosen = [(0.0, ego_id)]
        for cav in cavs[1:]:
            if cav not in metas:
                continue
            pose = metas[cav]["lidar_pose"]
            d = float(np.hypot(pose[0] - ego_pose[0], pose[1] - ego_pose[1]))
            if d <= COM_RANGE:
                chosen.append((d, cav))
        chosen.sort(key=lambda x: x[0])
        chosen = chosen[: self.layout.total]

        L, n = self.layout.total, self.max_points
        points = np.zeros((L, n, 4), np.float32)
        points_mask = np.zeros((L, n), bool)
        clean = np.ones((L, n), bool)
        radar_points = np.zeros((L, n // 4, 4), np.float32)
        radar_mask = np.zeros((L, n // 4), bool)
        agent_mask = np.zeros((L,), bool)
        prior = np.zeros((L, 3), np.float32)
        pairwise = np.tile(np.eye(4, dtype=np.float32), (L, 1, 1))
        pairwise_full = np.tile(np.eye(4, dtype=np.float32), (L, L, 1, 1))
        t_cav_ego_all = []

        cam_slots = {}
        for slot, (dist, cav) in enumerate(chosen):
            agent_mask[slot] = True
            pose = metas[cav]["lidar_pose"]
            t_cav_ego = tf.pose_a_to_b(pose, ego_pose)
            t_cav_ego_all.append(t_cav_ego)
            if not self.proj_first:
                pairwise[slot] = t_cav_ego.astype(np.float32)
            prior[slot, 0] = float(metas[cav].get("ego_speed", 0.0))

            pcd = os.path.join(spath, cav, f"{stamp}.pcd")
            if os.path.isfile(pcd):
                if self.with_de:
                    from airv2x_tpu.data.native import load_pcd_label_into

                    cnt = load_pcd_label_into(
                        pcd,
                        points[slot],
                        clean[slot],
                        transform=t_cav_ego.astype(np.float32)
                        if self.proj_first else None,
                        lidar_range=np.asarray(self.lidar_range, np.float32),
                        ego_mask=2.0,
                    )
                else:
                    cnt = load_pcd_into(
                        pcd,
                        points[slot],
                        transform=t_cav_ego.astype(np.float32)
                        if self.proj_first else None,
                        lidar_range=np.asarray(self.lidar_range, np.float32),
                        ego_mask=2.0,
                    )
                points_mask[slot, :cnt] = True
            if self.cam_conf is not None:
                from airv2x_tpu.data.camera import load_opv2v_cam_inputs

                cam = load_opv2v_cam_inputs(
                    os.path.join(spath, cav), stamp, metas[cav],
                    self.cam_conf, self.train, rng,
                )
                if cam is not None:
                    cam_slots[slot] = cam

            if self.use_radar:
                rpcd = os.path.join(spath, cav, f"{stamp}_radar.pcd")
                if os.path.isfile(rpcd):
                    cnt = load_pcd_into(
                        rpcd,
                        radar_points[slot],
                        transform=t_cav_ego.astype(np.float32)
                        if self.proj_first else None,
                        lidar_range=np.asarray(self.lidar_range, np.float32),
                        ego_mask=0.0,
                    )
                    radar_mask[slot, :cnt] = True

        if not self.proj_first:
            for i, ti in enumerate(t_cav_ego_all):
                for j, tj in enumerate(t_cav_ego_all):
                    pairwise_full[i, j] = np.linalg.solve(ti, tj)

        # gt: union of each cav's 'vehicles', deduped by id
        boxes = np.zeros((self.max_num, 7), np.float32)
        classes = np.ones((self.max_num,), np.int32)
        mask = np.zeros((self.max_num,), bool)
        seen = set()
        i = 0
        for _, cav in chosen:
            for oid, obj in (metas[cav].get("vehicles") or {}).items():
                if oid in seen or i >= self.max_num:
                    continue
                seen.add(oid)
                box = object_to_ego_box(obj, ego_pose, self.lidar_range)
                if box is None:
                    continue
                boxes[i] = box
                mask[i] = True
                i += 1

        batch = {
            "points": points,
            "points_mask": points_mask,
            "agent_mask": agent_mask,
            "pairwise_t": pairwise,
            "pairwise_t_full": pairwise_full,
            "prior_encoding": prior,
        }
        if self.use_radar:
            batch["radar_points"] = radar_points
            batch["radar_points_mask"] = radar_mask
        if self.with_de:
            batch["de_points_mask"] = points_mask & clean
        if self.cam_conf is not None and cam_slots:
            from airv2x_tpu.data.camera import stack_cam_slots

            batch["cam_vehicle"] = stack_cam_slots(cam_slots, L)
        gt = {"boxes": boxes, "mask": mask, "classes": classes}
        return batch, gt, ego_pose
