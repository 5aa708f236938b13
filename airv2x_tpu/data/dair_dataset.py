"""DAIR-V2X vehicle+infrastructure dataset adapter (host pipeline).

Structure twin of data_utils/datasets/dair/intermediate_fusion_dataset.py:
a fixed 2-agent setup (max_cav = 2: ego vehicle + one roadside unit), frames
indexed by ``cooperative/data_info.json``, with per-frame point clouds,
6-DoF lidar poses and a cooperative 3D-box label file.

Two on-disk formats are supported:

  * the *raw* DAIR-V2X release: ``cooperative/data_info.json`` entries with
    image/pointcloud paths + per-frame ``system_error_offset``; poses come
    from the calib chain (vehicle lidar_to_novatel ∘ novatel_to_world,
    infrastructure virtuallidar_to_world + offset —
    utils/transformation_utils.py:452-507), labels from cooperative
    ``world_8_points`` corner sets (box_utils.project_world_objects_dairv2x
    :1211-1262), and — when a model config declares a ``cam`` block —
    single-camera inputs from lidar_to_camera⁻¹ + cam_K
    (dair/lidar_camera_intermediate_fusion_dataset.py:330-560);
  * a *normalized* schema with precomputed ``vehicle_lidar_pose`` /
    ``infrastructure_lidar_pose`` and {location, rotation, extent} labels
    (produced by tools/dair_convert.py).
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


# ---------------------------------------------------------------------------
# raw DAIR-V2X calib chain (utils/transformation_utils.py:452-507)


def _mult_coord(rot_a2b, trans_a2b, rot_b2c, trans_b2c):
    """transformation_utils.muilt_coord (:452-460)."""
    rot_a2b = np.array(rot_a2b, np.float64).reshape(3, 3)
    rot_b2c = np.array(rot_b2c, np.float64).reshape(3, 3)
    rot = rot_b2c @ rot_a2b
    trans = rot_b2c @ np.array(trans_a2b, np.float64).reshape(3, 1) + np.array(
        trans_b2c, np.float64
    ).reshape(3, 1)
    return rot, trans


def _rt_matrix(rot, trans):
    m = np.eye(4, dtype=np.float64)
    m[:3, :3] = np.array(rot, np.float64).reshape(3, 3)
    m[:3, 3] = np.array(trans, np.float64).reshape(3)
    return m


def veh_lidar_to_world(lidar_to_novatel: dict, novatel_to_world: dict):
    """veh_side_rot_and_trans_to_trasnformation_matrix (:463-481)."""
    rot, trans = _mult_coord(
        lidar_to_novatel["transform"]["rotation"],
        lidar_to_novatel["transform"]["translation"],
        novatel_to_world["rotation"],
        novatel_to_world["translation"],
    )
    return _rt_matrix(rot, trans)


def inf_lidar_to_world(virtuallidar_to_world: dict, system_error_offset: dict):
    """inf_side_rot_and_trans_to_trasnformation_matrix (:484-497): the
    per-frame system error offset shifts the infra translation."""
    trans = np.array(
        virtuallidar_to_world["translation"], np.float64
    ).reshape(3, 1).copy()
    if system_error_offset:
        trans[0, 0] += float(system_error_offset["delta_x"])
        trans[1, 0] += float(system_error_offset["delta_y"])
    return _rt_matrix(virtuallidar_to_world["rotation"], trans)


def camera_to_lidar_matrix(lidar_to_camera: dict):
    """inverse of rot_and_trans_to_trasnformation_matrix (:500-507)."""
    return np.linalg.inv(
        _rt_matrix(
            lidar_to_camera["rotation"], lidar_to_camera["translation"]
        )
    )


def _world_8_points_to_box(corners_world, world_to_lidar, lidar_range):
    """project_world_objects_dairv2x (box_utils.py:1211-1262): corner
    projection -> center box (hwl) with the z-expanded range mask."""
    from airv2x_tpu.ops import geometry as geo
    import jax.numpy as jnp

    c = np.pad(np.asarray(corners_world, np.float64), ((0, 0), (0, 1)),
               constant_values=1.0)
    c_lidar = (world_to_lidar @ c.T).T[:, :3]
    box = np.asarray(
        geo.corner_to_center(jnp.asarray(c_lidar[None], jnp.float32),
                             order="hwl")
    )[0]
    lr = list(lidar_range)
    if not (
        lr[0] < box[0] < lr[3]
        and lr[1] < box[1] < lr[4]
        and (lr[2] - 1) < box[2] < (lr[5] + 1)
    ):
        return None
    return box.astype(np.float32)


def _dair_raw_frame(root: str, info: dict):
    """Resolve one raw-format data_info entry into the normalized schema
    via the calib chain (lidar_camera_intermediate_fusion_dataset.py
    :330-470)."""
    veh_frame_id = os.path.splitext(
        os.path.basename(info["vehicle_pointcloud_path"])
    )[0]
    inf_frame_id = os.path.splitext(
        os.path.basename(info["infrastructure_pointcloud_path"])
    )[0]

    def calib(rel):
        p = os.path.join(root, rel)
        return _load_json(p) if os.path.isfile(p) else None

    l2n = calib(f"vehicle-side/calib/lidar_to_novatel/{veh_frame_id}.json")
    n2w = calib(f"vehicle-side/calib/novatel_to_world/{veh_frame_id}.json")
    v2w = calib(
        f"infrastructure-side/calib/virtuallidar_to_world/{inf_frame_id}.json"
    )
    veh_mat = veh_lidar_to_world(l2n, n2w)
    inf_mat = inf_lidar_to_world(v2w, info.get("system_error_offset"))
    out = {
        "vehicle_pointcloud_path": info["vehicle_pointcloud_path"],
        "infrastructure_pointcloud_path": info["infrastructure_pointcloud_path"],
        "vehicle_lidar_pose": list(tf.world_to_pose(veh_mat)),
        "infrastructure_lidar_pose": list(tf.world_to_pose(inf_mat)),
        "cooperative_label_path": info["cooperative_label_path"],
        "raw_labels": True,
    }
    for side, key, fid in (
        ("vehicle-side", "vehicle", veh_frame_id),
        ("infrastructure-side", "infrastructure", inf_frame_id),
    ):
        img = info.get(f"{key}_image_path")
        l2c = calib(f"{side}/calib/lidar_to_camera/{fid}.json")
        intr = calib(f"{side}/calib/camera_intrinsic/{fid}.json")
        if img and l2c and intr:
            out[f"{key}_image_path"] = img
            out[f"{key}_camera2lidar"] = camera_to_lidar_matrix(l2c)
            out[f"{key}_cam_k"] = np.array(
                intr["cam_K"], np.float32
            ).reshape(3, 3)
    return out


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
        frames = _load_json(info_path) if os.path.isfile(info_path) else []
        # raw DAIR-V2X entries carry only paths + system_error_offset; the
        # poses come from the per-frame calib chain
        self.frames = [
            f if "vehicle_lidar_pose" in f else _dair_raw_frame(root_dir, f)
            for f in frames
        ]
        cam_cfg = None
        margs = (hypes.get("model") or {}).get("args") or {}
        for t in ("vehicle", "rsu"):
            c = (margs.get(t) or {}).get("cam")
            if c:
                cam_cfg = c
                break
        self.cam_cfg = cam_cfg

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
        if info.get("raw_labels"):
            # raw cooperative labels carry world-frame corner sets
            # (project_world_objects_dairv2x, box_utils.py:1211-1262)
            world_to_lidar = np.linalg.inv(tf.pose_to_world(veh_pose))
            for obj in labels:
                if i >= self.max_num:
                    break
                pts8 = obj.get("world_8_points")
                if pts8 is None:
                    continue
                box = _world_8_points_to_box(
                    pts8, world_to_lidar, self.lidar_range
                )
                if box is None:
                    continue
                boxes[i] = box
                mask[i] = True
                i += 1
            labels = []
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
        cam = self._load_cameras(info)
        if cam is not None:
            batch["cam_vehicle"] = cam
        gt = {"boxes": boxes, "mask": mask, "classes": classes}
        return batch, gt

    def _load_cameras(self, info):
        """Per-slot single-camera inputs from the raw calib chain
        (lidar_camera_intermediate_fusion_dataset.py:505-560): image resized
        to final_dim + imagenet-normalized, cam_K intrinsics, camera->lidar
        rots/trans, identity post transforms (the reference resizes without
        touching post_rots — quirk preserved)."""
        if self.cam_cfg is None:
            return None
        try:
            from PIL import Image
        except ImportError:
            return None
        from airv2x_tpu.data.camera import normalize_img

        h, w = self.cam_cfg["data_aug_conf"]["final_dim"]
        L = 2
        imgs = np.zeros((L, 1, h, w, 3), np.float32)
        intr = np.broadcast_to(
            np.eye(3, dtype=np.float32), (L, 1, 3, 3)
        ).copy()
        rots = intr.copy()
        trans = np.zeros((L, 1, 3), np.float32)
        found = False
        for slot, key in enumerate(("vehicle", "infrastructure")):
            img_rel = info.get(f"{key}_image_path")
            c2l = info.get(f"{key}_camera2lidar")
            cam_k = info.get(f"{key}_cam_k")
            if not img_rel or c2l is None or cam_k is None:
                continue
            p = os.path.join(self.root, img_rel)
            if not os.path.isfile(p):
                continue
            img = Image.open(p).resize((w, h))
            imgs[slot, 0] = normalize_img(img)
            intr[slot, 0] = cam_k
            c2l = np.asarray(c2l, np.float32)
            rots[slot, 0] = c2l[:3, :3]
            trans[slot, 0] = c2l[:3, 3]
            found = True
        if not found:
            return None
        post_rots = np.broadcast_to(
            np.eye(3, dtype=np.float32), (L, 1, 3, 3)
        ).copy()
        return {
            "imgs": imgs,
            "intrinsics": intr,
            "rots": rots,
            "trans": trans,
            "post_rots": post_rots,
            "post_trans": np.zeros((L, 1, 3), np.float32),
        }
