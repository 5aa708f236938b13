"""AirV2X on-disk dataset -> fixed-shape TPU batches (host pipeline).

Behavioural twin of the reference data layer for LiDAR intermediate fusion
(data_utils/datasets/airv2x/basedataset.py + intermediate_fusion_dataset.py),
re-designed for a functional, shape-static pipeline:

  * directory walk ``root/<scenario>/timestamp_*/agent_*/``
    (utils/airv2x_utils.parse_seq :207-264) with metadata.pkl / objects.pkl
    pickles and lidar .pcd files;
  * ego selection (first vehicle; optionally a seeded random vehicle per
    epoch — the reference's ``shuffle_ego`` mutates shared state from worker
    processes, basedataset.py:246,534-549; here the choice is a pure
    function of (sample, epoch, seed));
  * per-type communication-range gating (VEH/RSU 120 m, DRONE 180 m,
    data_utils/datasets/__init__.py:88-91) and top-k nearest selection per
    type (intermediate_fusion_dataset.py:263);
  * wild settings: async latency (time-delayed CAV frames) and gaussian
    pose noise (basedataset.py:82-124, 699-758);
  * per-agent clouds projected into the (current) ego frame when
    ``proj_first``, range-masked, padded to the static slot layout of
    models.base.SlotLayout — voxelization happens ON DEVICE
    (ops.voxelize), not here;
  * objects deduped by id across agents, converted to ego-frame hwl boxes
    (box_utils.project_world_objects_airv2x :576-650), padded to max_num.
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass

import numpy as np

from airv2x_tpu.models.base import AGENT_TYPES, SlotLayout
from airv2x_tpu.utils import transforms as tf

COM_RANGE = {"vehicle": 120.0, "rsu": 120.0, "drone": 180.0}
VALID_CLASSES = (1, 2, 3, 4, 5, 6)


def _load_pickle(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def abs_world_pose(rel_pose, center_pose):
    """Sensor pose relative to its carrier -> world pose (elementwise sum,
    transformation_utils.get_abs_world_pose :526-540)."""
    return [a + b for a, b in zip(rel_pose[:6], center_pose[:6])]


def _corners_from_extent(extent):
    ex, ey, ez = extent[:3]
    signs = np.array(
        [
            [1, -1, -1], [1, 1, -1], [-1, 1, -1], [-1, -1, -1],
            [1, -1, 1], [1, 1, 1], [-1, 1, 1], [-1, -1, 1],
        ],
        dtype=np.float64,
    )
    return signs * np.array([ex, ey, ez])


def _corner_to_center_hwl(corners):
    """(8, 3) corners -> 7-dof hwl box (numpy twin of ops.geometry)."""
    import jax.numpy as jnp

    from airv2x_tpu.ops.geometry import corner_to_center

    return np.asarray(corner_to_center(jnp.asarray(corners)[None], order="hwl"))[0]


def object_to_ego_box(obj: dict, ego_lidar_pose, lidar_range, order="hwl"):
    """World object metadata -> 7-dof box in ego-lidar frame, or None if
    outside range (box_utils.project_world_objects_airv2x)."""
    loc = obj["location"]
    center = obj.get("center", [0, 0, 0])
    extent = obj["extent"]
    object_pose = [
        loc[0] + center[0], loc[1] + center[1], loc[2] + center[2],
        loc[3], loc[4], loc[5],
    ]
    obj2lidar = tf.pose_a_to_b(object_pose, ego_lidar_pose)
    corners = _corners_from_extent(extent)
    corners = corners @ obj2lidar[:3, :3].T + obj2lidar[:3, 3]
    box = _corner_to_center_hwl(corners)
    x, y = box[0], box[1]
    if not (lidar_range[0] < x < lidar_range[3] and lidar_range[1] < y < lidar_range[4]):
        return None
    return box


@dataclass
class WildSettings:
    """Async latency + localization-error simulation (basedataset wild_setting)."""

    async_mode: bool = False
    async_overhead_ms: float = 100.0
    data_rate_hz: float = 10.0
    loc_error: bool = False
    xyz_std: float = 0.2
    ryp_std: float = 0.2


class AirV2XDataset:
    """Index the on-disk dataset and produce fixed-shape samples."""

    def __init__(
        self,
        hypes: dict,
        split_dir: str,
        train: bool = True,
        wild: WildSettings | None = None,
        seed: int = 0,
    ):
        self.hypes = hypes
        self.train = train
        self.wild = wild or WildSettings()
        self.seed = seed
        self.layout = SlotLayout.from_args(hypes["model"]["args"])
        self.lidar_range = hypes["preprocess"]["cav_lidar_range"]
        self.max_points = int(hypes["preprocess"].get("max_points", 60000))
        self.max_num = int(hypes["postprocess"]["max_num"])
        self.proj_first = bool(
            hypes.get("fusion", {}).get("args", {}).get("proj_first", True)
        )

        # camera branch: which agent types consume images, and their LSS
        # augmentation confs (intermediate_fusion_dataset.get_item_single_car
        # :490-583 loads + augments per-type cameras)
        margs = hypes["model"]["args"]
        # BM2CP sample assembly: per-camera lidar-projected depth maps
        # (reference intermediate_fusion_dataset_bm2cp.py)
        fusion_core = str(hypes.get("fusion", {}).get("core_method", ""))
        self.bm2cp = "bm2cp" in (
            fusion_core + hypes["model"]["core_method"]
        ).lower()
        self.cam_confs = {}
        self.cam_depth = {}
        self.cam_grid = {}
        for tname in AGENT_TYPES:
            tcfg = margs.get(tname)
            if not isinstance(tcfg, dict):
                continue
            if "cam" in tcfg.get("modalities", []):
                cam = tcfg["cam"]
            elif self.bm2cp and "img_params" in tcfg:
                # faithful BM2CP schema: veh/rsu camera confs live under
                # img_params (airv2x_intermediate_bm2cp.yaml model.args)
                cam = tcfg["img_params"]
            elif self.bm2cp and "grid_conf" in tcfg and "data_aug_conf" in tcfg:
                # BM2CP drone: flat LSS conf dict
                cam = tcfg
            else:
                continue
            self.cam_confs[tname] = cam["data_aug_conf"]
            self.cam_depth[tname] = bool(
                cam.get("use_depth_gt") or cam.get("depth_supervision")
            )
            if "grid_conf" in cam:
                self.cam_grid[tname] = cam["grid_conf"]
        # K-frame temporal samples for SCOPE / How2comm
        # (intermediate_fusion_dataset_multi_frame_how2comm.py:28,93-104):
        # explicit fusion.args.num_sweep_frames, else the model's
        # temporal_fusion.frames, else single-frame
        core = hypes["model"]["core_method"].lower()
        self.frames = int(
            hypes.get("fusion", {}).get("args", {}).get("num_sweep_frames", 0)
            or (
                margs.get("temporal_fusion", {}).get("frames", 0)
                if any(k in core for k in ("scope", "how2comm"))
                else 0
            )
            or 1
        )
        # seg task: ego's 7-dynamic + 3-static label maps
        # (basedataset.py:279-301,885-936)
        self.load_seg = (
            hypes.get("task", margs.get("task", "det")) == "seg"
        )

        self.samples = []  # (scenario_path, [sorted timestamp dirs], t_index)
        if os.path.isdir(split_dir):
            for scen in sorted(os.listdir(split_dir)):
                spath = os.path.join(split_dir, scen)
                if not os.path.isdir(spath):
                    continue
                stamps = sorted(
                    d
                    for d in os.listdir(spath)
                    if d.startswith("timestamp_")
                    and os.path.isdir(os.path.join(spath, d))
                )
                for i in range(len(stamps)):
                    self.samples.append((spath, stamps, i))

    def __len__(self):
        return len(self.samples)

    # ---------- per-timestamp agent parsing ----------

    def _agents_at(self, spath, stamp):
        tdir = os.path.join(spath, stamp)
        agents = {}
        for d in sorted(os.listdir(tdir)):
            apath = os.path.join(tdir, d)
            if not os.path.isdir(apath) or not d.startswith("agent_"):
                continue
            meta_path = os.path.join(apath, "metadata.pkl")
            if not os.path.isfile(meta_path):
                continue
            meta = _load_pickle(meta_path)
            lidars = sorted(
                os.path.join(apath, f)
                for f in os.listdir(apath)
                if f.endswith(".pcd") and "lidar" in f and "semantic" not in f
            )
            agents[int(d.split("_")[1])] = {
                "path": apath,
                "meta": meta,
                "type": meta["agent_type"],
                "lidar": lidars[0] if lidars else None,
            }
        objs_path = os.path.join(tdir, "objects.pkl")
        objects = _load_pickle(objs_path) if os.path.isfile(objs_path) else {}
        objects = {
            k: v for k, v in objects.items() if v.get("class") in VALID_CLASSES
        }
        return agents, objects

    @staticmethod
    def _lidar_world_pose(meta):
        return abs_world_pose(
            meta["lidar"]["lidar_pose"], meta["odometry"]["ego_pos"]
        )

    def _delay_stamp(self, stamps, idx):
        """Index of the delayed frame for non-ego agents (async mode)."""
        if not self.wild.async_mode:
            return idx
        frames = int(
            round(self.wild.async_overhead_ms / 1000.0 * self.wild.data_rate_hz)
        )
        return max(idx - frames, 0)

    # ---------- sample assembly ----------

    def __getitem__(self, idx: int, epoch: int = 0):
        spath, stamps, t = self.samples[idx]
        rng = np.random.default_rng((self.seed, epoch, idx))
        agents, objects = self._agents_at(spath, stamps[t])
        vehicles = [k for k, a in agents.items() if a["type"] == "vehicle"]
        if not vehicles:
            raise ValueError(f"no vehicle agent in {spath}/{stamps[t]}")
        ego_id = (
            int(rng.choice(vehicles)) if self.train and len(vehicles) > 1
            else vehicles[0]
        )

        if self.frames <= 1:
            batch, gt, _ = self._assemble(
                spath, stamps, t, ego_id, rng, preloaded=(agents, objects)
            )
            return batch, gt

        # K-frame temporal sample (oldest -> current), same ego across
        # frames; frame k's points stay in k's ego frame and ``history_t``
        # carries the k->current ego transform
        # (intermediate_fusion_dataset_multi_frame_how2comm.py:28,93-104)
        ts = [max(t - k, 0) for k in range(self.frames - 1, -1, -1)]
        frames, poses = [], []
        gt = None
        for k in ts:
            b, g, pose = self._assemble(spath, stamps, k, ego_id, rng)
            frames.append(b)
            poses.append(pose)
            gt = g  # labels come from the current (last) frame
        cur_pose = poses[-1]
        batch = {
            key: np.stack([f[key] for f in frames])
            for key in ("points", "points_mask", "agent_mask")
        }
        for key in ("pairwise_t", "pairwise_t_full", "prior_encoding"):
            batch[key] = frames[-1][key]
        for key, v in frames[-1].items():
            if key.startswith("cam_") or key.endswith("_seg_label"):
                batch[key] = v
        batch["history_t"] = np.stack(
            [tf.pose_a_to_b(p, cur_pose).astype(np.float32) for p in poses]
        )
        return batch, gt

    def _assemble(self, spath, stamps, t, ego_id, rng, preloaded=None):
        if preloaded is not None:
            # __getitem__ already walked this timestamp for ego selection —
            # reuse instead of re-reading every agent's metadata.pkl
            agents, objects = preloaded
        else:
            agents, objects = self._agents_at(spath, stamps[t])
        if ego_id not in agents:  # ego absent in a historical frame
            vehicles = [k for k, a in agents.items() if a["type"] == "vehicle"]
            ego_id = vehicles[0]
        ego = agents[ego_id]
        ego_pose = self._lidar_world_pose(ego["meta"])

        # delayed frame for non-ego agents
        td = self._delay_stamp(stamps, t)
        agents_delay, _ = (
            self._agents_at(spath, stamps[td]) if td != t else (agents, None)
        )

        # distance + comm-range gating, top-k nearest per type
        chosen = {tname: [] for tname in AGENT_TYPES}
        for aid, a in agents.items():
            src = agents_delay.get(aid, a) if aid != ego_id else a
            pose = self._lidar_world_pose(src["meta"])
            d = float(np.hypot(pose[0] - ego_pose[0], pose[1] - ego_pose[1]))
            if aid != ego_id and d > COM_RANGE[a["type"]]:
                continue
            chosen[a["type"]].append((0.0 if aid == ego_id else d, aid, src))
        for tname in AGENT_TYPES:
            chosen[tname].sort(key=lambda x: x[0])
            cap = self.layout.counts[AGENT_TYPES.index(tname)]
            chosen[tname] = chosen[tname][:cap]

        L = self.layout.total
        n = self.max_points
        points = np.zeros((L, n, 4), np.float32)
        points_mask = np.zeros((L, n), bool)
        agent_mask = np.zeros((L,), bool)
        prior = np.zeros((L, 3), np.float32)
        pairwise = np.tile(np.eye(4, dtype=np.float32), (L, 1, 1))
        pairwise_full = np.tile(np.eye(4, dtype=np.float32), (L, L, 1, 1))

        from airv2x_tpu.data.native import load_pcd_into

        cam_slots: dict = {tname: {} for tname in self.cam_confs}
        ego_dir = None
        for tname in AGENT_TYPES:
            sl = self.layout.slots(tname)
            for j, (dist, aid, a) in enumerate(chosen[tname]):
                slot = sl.start + j
                agent_mask[slot] = True
                pose = self._lidar_world_pose(a["meta"])
                if self.wild.loc_error and aid != ego_id:
                    pose = tf.add_pose_noise(
                        pose, rng, self.wild.xyz_std, self.wild.ryp_std
                    )
                t_cav_ego = tf.pose_a_to_b(pose, ego_pose)
                pairwise[slot] = t_cav_ego.astype(np.float32)
                # prior_encoding = [velocity, time_delay, infra]
                # (intermediate_fusion_dataset.py:222,822-829; velocity =
                # odometry ego_speed / 30)
                prior[slot, 0] = (
                    float(a["meta"]["odometry"].get("ego_speed", 0.0)) / 30.0
                )
                prior[slot, 1] = float(t - self._delay_stamp(stamps, t))
                prior[slot, 2] = float(tname == "rsu")
                if aid == ego_id:
                    ego_dir = a["path"]

                cnt = 0
                if a["lidar"] is not None:
                    # one native pass: parse + ego mask + project + range crop
                    cnt = load_pcd_into(
                        a["lidar"],
                        points[slot],
                        transform=t_cav_ego.astype(np.float32)
                        if self.proj_first
                        else None,
                        lidar_range=np.asarray(self.lidar_range, np.float32),
                        ego_mask=2.0,
                    )
                    points_mask[slot, :cnt] = True
                    if cnt == 0:
                        # reference empty-cloud fallback: a dummy (0,0,0,0)
                        # point that voxelizes at the grid center (the
                        # second far dummy is out of range on both sides;
                        # sp_voxel_preprocessor.py:74-91). Labels for such
                        # agents are already masked upstream.
                        points[slot, 0] = 0.0
                        points_mask[slot, 0] = True

                if tname in self.cam_confs:
                    from airv2x_tpu.data.camera import load_agent_cam_inputs

                    cam = load_agent_cam_inputs(
                        a["path"],
                        a["meta"],
                        tname,
                        self.cam_confs[tname],
                        self.train,
                        rng,
                        with_depth=self.cam_depth[tname],
                    )
                    if cam is not None:
                        # BM2CP variant: lidar-depth-to-image projection
                        # (intermediate_fusion_dataset_bm2cp.py:661-679);
                        # drones have no lidar -> all-(-1) maps, exactly the
                        # reference's "predicted depth fills non-covered"
                        if self.bm2cp and tname in self.cam_grid:
                            from airv2x_tpu.data.camera import (
                                load_agent_depth_maps,
                            )

                            dm = load_agent_depth_maps(
                                a["path"],
                                a["meta"],
                                tname,
                                points[slot, :cnt, :3] if cnt else
                                np.zeros((0, 3), np.float32),
                                self.cam_grid[tname],
                                tuple(self.cam_confs[tname]["final_dim"]),
                                cav_to_points=t_cav_ego
                                if self.proj_first else None,
                            )
                            if dm is not None:
                                cam["depth_maps"] = dm
                        cam_slots[tname][slot] = cam

        if self.proj_first:
            pairwise_batch = np.tile(np.eye(4, dtype=np.float32), (L, 1, 1))
        else:
            pairwise_batch = pairwise
        for i in range(L):
            for j in range(L):
                pairwise_full[i, j] = (
                    np.linalg.solve(pairwise[i], pairwise[j])
                    if not self.proj_first
                    else np.eye(4)
                )

        # gt objects (dedup by id is inherent: objects.pkl is global)
        boxes = np.zeros((self.max_num, 7), np.float32)
        classes = np.zeros((self.max_num,), np.int32)
        mask = np.zeros((self.max_num,), bool)
        i = 0
        for oid, obj in objects.items():
            if i >= self.max_num:
                break
            box = object_to_ego_box(obj, ego_pose, self.lidar_range)
            if box is None:
                continue
            boxes[i] = box
            classes[i] = int(obj["class"])
            mask[i] = True
            i += 1

        batch = {
            "points": points,
            "points_mask": points_mask,
            "agent_mask": agent_mask,
            "pairwise_t": pairwise_batch,
            "pairwise_t_full": pairwise_full,
            "prior_encoding": prior,
        }

        # camera inputs: fixed (L, Ncam, fH, fW, C) per type, zero-filled
        # outside the type's populated slots
        from airv2x_tpu.data.camera import stack_cam_slots

        for tname, slots_data in cam_slots.items():
            if not slots_data:
                continue
            batch[f"cam_{tname}"] = stack_cam_slots(slots_data, L)

        if self.load_seg and ego_dir is not None:
            from airv2x_tpu.data.camera import load_seg_labels

            dyn, sta = load_seg_labels(ego_dir)
            if dyn is not None:
                batch["dynamic_seg_label"] = dyn.astype(np.int32)
            if sta is not None:
                batch["static_seg_label"] = sta.astype(np.int32)

        gt = {"boxes": boxes, "mask": mask, "classes": classes}
        return batch, gt, ego_pose
