"""Shared on-disk AirV2X-format fixture generator for tests.

Writes the reference dataset layout (root/<scenario>/timestamp_*/agent_*/
with metadata.pkl, objects.pkl, lidar.pcd, per-camera PNGs + CARLA-encoded
depth PNGs, and 7-dynamic + 3-static BEV seg-map PNGs) so the host pipeline
can be tested end to end without the released dataset.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from airv2x_tpu.data.camera import CAM_KEYS, encode_depth_carla, lss_to_ue4
from airv2x_tpu.data.pcd import write_pcd

# cam->lidar in LSS axes used for every fixture camera: camera looks along
# +x of the agent, mounted at (0.5, 0, 1.5)
FIXTURE_CAM_TO_LIDAR = np.array(
    [
        [0.0, 0.0, 1.0, 0.5],
        [-1.0, 0.0, 0.0, 0.0],
        [0.0, -1.0, 0.0, 1.5],
        [0.0, 0.0, 0.0, 1.0],
    ],
    np.float32,
)

FIXTURE_IMG_HW = (64, 96)  # original camera H, W (final dims %16 == 0
# so the LSS trunk's /4 /8 /16 skip connections line up)
FIXTURE_DEPTH_M = 10.0  # within the tiny test grid (19.2 m) so LSS
# gt-depth lifting lands inside the BEV canvas
FIXTURE_SEG_HW = 64

FIXTURE_AUG_CONF = {
    "H": FIXTURE_IMG_HW[0],
    "W": FIXTURE_IMG_HW[1],
    "final_dim": [32, 48],
    "resize_lim": [0.5, 0.6],
    "bot_pct_lim": [0.0, 0.0],
    "rot_lim": [0.0, 0.0],
    "rand_flip": False,
}

# 2 cameras per type keeps the fixture small; order must be a prefix of
# the reference's per-type camera key order (airv2x_utils.py:276-292)
FIXTURE_NCAM = {"vehicle": 2, "rsu": 2, "drone": 1}


def _write_cameras(adir, atype, rng):
    from PIL import Image

    h, w = FIXTURE_IMG_HW
    cam_meta = {}
    for key in CAM_KEYS[atype][: FIXTURE_NCAM[atype]]:
        rgb = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(rgb).save(os.path.join(adir, f"{key}.png"))
        depth = np.full((h, w), FIXTURE_DEPTH_M, np.float32)
        Image.fromarray(encode_depth_carla(depth)).save(
            os.path.join(adir, key.replace("camera", "depth") + ".png")
        )
        intr = np.array(
            [[w * 0.8, 0, w / 2], [0, w * 0.8, h / 2], [0, 0, 1]], np.float32
        )
        cam_meta[key] = {
            "intrinsic": intr,
            "extrinsic": lss_to_ue4(FIXTURE_CAM_TO_LIDAR),
        }
    return cam_meta


def _write_seg_maps(adir):
    from PIL import Image

    s = FIXTURE_SEG_HW
    for i in range(7):
        img = np.zeros((s, s), np.uint8)
        img[4 * i : 4 * i + 4, : s // 2] = 255  # distinct stripe per layer
        Image.fromarray(img).save(
            os.path.join(adir, f"map_dynamic_bev_layer_{i}.png")
        )
    for i, name in enumerate(
        ("map_static_background", "map_static_lane", "map_static_road")
    ):
        img = np.zeros((s, s), np.uint8)
        img[:, 8 * i : 8 * i + 8] = 255
        Image.fromarray(img).save(os.path.join(adir, f"{name}.png"))


def make_fixture(
    root,
    n_timestamps=2,
    rng=None,
    with_camera=False,
    with_seg=False,
    ego_speed=15.0,
):
    """Create a mini AirV2X-format dataset: 2 vehicles + 1 rsu + 1 drone,
    one in-range object + one out-of-range object per timestamp."""
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
                "odometry": {"ego_pos": list(pose), "ego_speed": ego_speed},
                "lidar": {"lidar_pose": [0.0, 0.0, 1.9, 0, 0, 0]},
            }
            if with_camera:
                meta.update(_write_cameras(adir, atype, rng))
            if with_seg:
                _write_seg_maps(adir)
            with open(os.path.join(adir, "metadata.pkl"), "wb") as f:
                pickle.dump(meta, f)
            # a small cloud around the agent (world frame shifted to sensor);
            # the drone looks down at the ground from its altitude
            pts = rng.normal(scale=10.0, size=(500, 4)).astype(np.float32)
            pts[:, 2] = rng.uniform(-1.5, 0.5, 500) - 1.9 - pose[2]
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


def cam_hypes(base_hypes, types=("vehicle",)):
    """Inject a camera modality (fixture aug conf + tiny LSS) into a config."""
    import copy

    hypes = copy.deepcopy(base_hypes)
    for t in types:
        tcfg = hypes["model"]["args"][t]
        tcfg["modalities"] = list(
            dict.fromkeys(list(tcfg.get("modalities", [])) + ["cam"])
        )
        tcfg["cam"] = {
            "grid_conf": {
                "xbound": [-19.2, 19.2, 0.4],
                "ybound": [-19.2, 19.2, 0.4],
                "zbound": [-10, 10, 20.0],
                "ddiscr": [2, 50, 8],
                "mode": "LID",
            },
            "data_aug_conf": dict(FIXTURE_AUG_CONF),
            "img_downsample": 8,
            "img_features": 16,
            "bevout_feature": 16,
            "camera_encoder": "EfficientNet",
            "use_depth_gt": True,
            "depth_supervision": False,
        }
    return hypes
