"""OPV2V-format dataset pipeline with a generated fixture."""

import os

import numpy as np
import yaml

from airv2x_tpu.data.opv2v_dataset import OPV2VDataset
from airv2x_tpu.data.pcd import write_pcd


def _hypes():
    return {
        "train_params": {"max_cav": 3},
        "preprocess": {
            "cav_lidar_range": [-40, -40, -3, 40, 40, 1],
            "args": {"voxel_size": [0.4, 0.4, 4]},
            "max_points": 2048,
        },
        "postprocess": {"max_num": 30},
        "fusion": {"args": {"proj_first": True}},
    }


def _fixture(root, rng):
    scen = os.path.join(root, "2021_08_16_01_01_01")
    poses = {"641": [10.0, 5.0, 1.9, 0, 0, 0], "650": [30.0, -5.0, 1.9, 0, 40.0, 0]}
    for t in ("000068", "000070"):
        for cav, pose in poses.items():
            cdir = os.path.join(scen, cav)
            os.makedirs(cdir, exist_ok=True)
            meta = {
                "lidar_pose": list(pose),
                "ego_speed": 7.5,
                "vehicles": {
                    301: {
                        "location": [20.0, 0.0, 0.4],
                        "angle": [0, 15.0, 0],
                        "center": [0.0, 0.0, 0.4],
                        "extent": [2.2, 1.0, 0.75],
                    },
                    302: {
                        "location": [500.0, 0.0, 0.4],  # out of range
                        "angle": [0, 0, 0],
                        "center": [0.0, 0.0, 0.4],
                        "extent": [2.2, 1.0, 0.75],
                    },
                },
            }
            with open(os.path.join(cdir, f"{t}.yaml"), "w") as f:
                yaml.safe_dump(meta, f)
            pts = rng.normal(scale=15.0, size=(400, 4)).astype(np.float32)
            pts[:, 2] = rng.uniform(-1.5, 0.5, 400) - 1.9
            write_pcd(os.path.join(cdir, f"{t}.pcd"), pts)
            write_pcd(os.path.join(cdir, f"{t}_radar.pcd"), pts[:100])
    return root


def test_opv2v_walk_and_sample(tmp_path, rng):
    root = _fixture(str(tmp_path), rng)
    ds = OPV2VDataset(_hypes(), root, train=False, use_radar=True)
    assert len(ds) == 2
    batch, gt = ds[0]
    assert batch["points"].shape == (3, 2048, 4)
    assert batch["agent_mask"].tolist() == [True, True, False]
    assert batch["points_mask"][0].sum() > 0
    assert batch["radar_points_mask"][0].sum() > 0
    assert batch["prior_encoding"][0, 0] == 7.5
    # one gt in range (world x=20 -> ego-frame ~(10, -5)), one out
    assert gt["mask"].sum() == 1
    box = gt["boxes"][gt["mask"]][0]
    assert abs(box[0] - 10.0) < 1.0 and abs(box[1] + 5.0) < 1.0
    # extent 2.2/1.0/0.75 half-dims -> l=4.4, w=2.0, h=1.5 in hwl order
    assert abs(box[3] - 1.5) < 0.05
    assert abs(box[4] - 2.0) < 0.05
    assert abs(box[5] - 4.4) < 0.05


def test_opv2v_multiframe_temporal(tmp_path, rng):
    """K-frame OPV2V samples with history transforms (scope/how2comm diet)."""
    root = _fixture(str(tmp_path), rng)
    hypes = _hypes()
    hypes["model"] = {
        "core_method": "point_pillar_scope",
        "args": {"temporal_fusion": {"frames": 2}},
    }
    ds = OPV2VDataset(hypes, root, train=False)
    assert ds.frames == 2
    batch, gt = ds[1]  # second timestamp -> frames (t0, t1)
    L, n = ds.layout.total, ds.max_points
    assert batch["points"].shape == (2, L, n, 4)
    assert batch["agent_mask"].shape == (2, L)
    assert batch["history_t"].shape == (2, 4, 4)
    np.testing.assert_allclose(batch["history_t"][-1], np.eye(4), atol=1e-6)
    assert gt["mask"].any()


def test_opv2v_wild_loc_noise(tmp_path, rng):
    """Localization noise perturbs non-ego clouds (wild settings)."""
    from airv2x_tpu.data.airv2x_dataset import WildSettings

    root = _fixture(str(tmp_path), rng)
    clean = OPV2VDataset(_hypes(), root, train=False)[0][0]
    noisy = OPV2VDataset(
        _hypes(), root, train=False,
        wild=WildSettings(loc_error=True, xyz_std=1.0, ryp_std=2.0),
    )[0][0]
    # ego slot (0) unchanged, non-ego points move
    np.testing.assert_allclose(clean["points"][0], noisy["points"][0])
    m = clean["points_mask"][1] & noisy["points_mask"][1]
    if m.any():
        assert np.abs(clean["points"][1][m] - noisy["points"][1][m]).max() > 0.05


def test_opv2v_camera_loading(tmp_path, rng):
    """camera{0..3} pngs + per-camera cords/intrinsics -> LSS input dict
    (lidar_camera_intermediate_fusion_dataset twin)."""
    from PIL import Image

    root = _fixture(str(tmp_path), rng)
    # add two cameras to every cav frame
    scen = os.path.join(root, "2021_08_16_01_01_01")
    h, w = 64, 96
    intr = [[w * 0.8, 0, w / 2], [0, w * 0.8, h / 2], [0, 0, 1]]
    for cav in os.listdir(scen):
        cdir = os.path.join(scen, cav)
        for t in ("000068", "000070"):
            ypath = os.path.join(cdir, f"{t}.yaml")
            meta = yaml.safe_load(open(ypath))
            for i in range(2):
                Image.fromarray(
                    rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                ).save(os.path.join(cdir, f"{t}_camera{i}.png"))
                cam_pose = list(meta["lidar_pose"])
                cam_pose[2] += 0.5
                cam_pose[4] += 90.0 * i
                meta[f"camera{i}"] = {"cords": cam_pose, "intrinsic": intr}
            yaml.safe_dump(meta, open(ypath, "w"))

    hypes = _hypes()
    hypes["model"] = {
        "core_method": "point_pillar",
        "args": {
            "vehicle": {
                "modalities": ["lidar", "cam"],
                "cam": {
                    "data_aug_conf": {
                        "H": h,
                        "W": w,
                        "final_dim": [32, 48],
                        "resize_lim": [0.5, 0.6],
                        "bot_pct_lim": [0.0, 0.0],
                        "rot_lim": [0.0, 0.0],
                        "rand_flip": False,
                    }
                },
            }
        },
    }
    ds = OPV2VDataset(hypes, root, train=False)
    batch, _ = ds[0]
    cams = batch["cam_vehicle"]
    L = ds.layout.total
    assert cams["imgs"].shape == (L, 2, 32, 48, 3)
    assert cams["intrinsics"].shape == (L, 2, 3, 3)
    # live slots carry real (non-identity) camera rotations
    assert np.abs(cams["rots"][0, 0] - np.eye(3)).max() > 0.1
    assert np.isfinite(cams["imgs"]).all()


def test_opv2v_mdd_clean_mask(tmp_path, rng):
    """V2X-R simulated-weather clouds carry the weather label in the green
    color channel; MDD training surfaces ``de_points_mask`` = in-mask AND
    label==0 (basedataset.py:350-358 de_lidar_np selection)."""
    from airv2x_tpu.data.pcd import read_pcd

    root = str(tmp_path)
    scen = os.path.join(root, "2021_08_16_01_01_01")
    pose = [0.0, 0.0, 1.9, 0, 0, 0]
    cdir = os.path.join(scen, "641")
    os.makedirs(cdir, exist_ok=True)
    meta = {"lidar_pose": pose, "vehicles": {}}
    with open(os.path.join(cdir, "000068.yaml"), "w") as f:
        yaml.safe_dump(meta, f)
    pts = rng.uniform(-30, 30, size=(300, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-1.5, 0.5, 300)
    pts[:, 3] = rng.uniform(0, 1, 300)
    label = (np.arange(300) % 3 == 0).astype(np.float32)  # 100 noise points
    write_pcd(os.path.join(cdir, "000068.pcd"), pts, label=label)
    write_pcd(os.path.join(cdir, "000068_radar.pcd"), pts[:50])

    # label + intensity round-trip through the packed rgb column
    rpts, rlabel = read_pcd(os.path.join(cdir, "000068.pcd"),
                            return_label=True)
    assert rpts.shape == (300, 4)
    np.testing.assert_allclose(rlabel, label, atol=1 / 255)
    np.testing.assert_allclose(
        rpts[:, 3], np.round(pts[:, 3] * 255) / 255, atol=1e-6
    )

    hypes = _hypes()
    hypes["model"] = {"core_method": "point_pillar_intermediate_lrf_MDD"}
    ds = OPV2VDataset(hypes, root, train=True, use_radar=True)
    batch, _ = ds[0]
    de = batch["de_points_mask"]
    pm = batch["points_mask"]
    assert not (de & ~pm).any()  # subset of the in-mask points
    kept = int(de[0].sum())
    total = int(pm[0].sum())
    assert 0 < kept < total  # weather points dropped
    assert abs(kept - total * 2 / 3) < total * 0.15
