"""Host-side camera / depth / segmentation-label loading (numpy + PIL).

Behavioural twin of the reference camera data path:

  * per-agent-type camera file lists and metadata keys
    (utils/airv2x_utils.py:36-115 RSU/VEHICLE/DRONE_FILES,
    utils/airv2x_utils.get_ex_intrinsic :266-314);
  * ue4 -> LSS extrinsic conversion (utils/camera_utils.ue4_to_lss :553-569);
  * CARLA 24-bit depth decode (utils/camera_utils.decode_depth_carla
    :145-167) producing metres;
  * LSS-style image augmentation — resize / crop / flip / rotate with the
    post_rot/post_tran homography bookkeeping
    (utils/camera_utils.sample_augmentation :31-58, img_transform :61-91);
  * imagenet normalization (camera_utils.normalize_img);
  * 7-dynamic + 3-static BEV segmentation label maps from per-layer PNGs
    (datasets/airv2x/basedataset.py:885-936 _wrap_segmentation_map).

Outputs are channel-last numpy arrays matching the contract of
``data.synthetic.add_camera_inputs`` (what the flax LSS encoder consumes):
imgs (Ncam, H, W, 3[+1]) float32, intrinsics (Ncam, 3, 3), rots/trans from
the cam->lidar matrix in LSS axes, post_rots/post_trans (3x3 / 3).
"""

from __future__ import annotations

import os

import numpy as np

# camera order per agent type = metadata key order the reference feeds to
# get_ex_intrinsic (airv2x_utils.py:276-292); file stem = key minus "_camera"
CAM_KEYS = {
    "vehicle": (
        "front_camera",
        "front_left_camera",
        "front_right_camera",
        "rear_camera",
        "rear_left_camera",
        "rear_right_camera",
    ),
    "rsu": ("back_camera", "front_camera", "left_camera", "right_camera"),
    "drone": ("bev_camera",),
}

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

# dynamic seg layers 0..6, static background/lane/road
DYNAMIC_SEG_FILES = tuple(f"map_dynamic_bev_layer_{i}.png" for i in range(7))
STATIC_SEG_FILES = (
    "map_static_background.png",
    "map_static_lane.png",
    "map_static_road.png",
)

_UE4_TO_LSS_R = np.array(
    [[0, 0, 1], [1, 0, 0], [0, -1, 0]], dtype=np.float32
)  # x_new = y_old, y_new = -z_old, z_new = x_old


def ue4_to_lss(camera_to_lidar_matrix: np.ndarray) -> np.ndarray:
    """UE4-convention extrinsic -> cam->lidar matrix in LSS camera axes
    (camera_utils.ue4_to_lss: inverse, then right-multiply the axis swap)."""
    m = np.linalg.inv(np.asarray(camera_to_lidar_matrix, np.float64))
    t = np.eye(4, dtype=np.float64)
    t[:3, :3] = _UE4_TO_LSS_R
    return (m @ t).astype(np.float32)


def lss_to_ue4(cam_to_lidar_lss: np.ndarray) -> np.ndarray:
    """Inverse of :func:`ue4_to_lss` — used by fixture generators/tests."""
    t = np.eye(4, dtype=np.float64)
    t[:3, :3] = _UE4_TO_LSS_R
    return np.linalg.inv(
        np.asarray(cam_to_lidar_lss, np.float64) @ np.linalg.inv(t)
    ).astype(np.float32)


def decode_depth_carla(path: str) -> np.ndarray:
    """CARLA RGB-encoded depth PNG -> metres (H, W) float32
    (camera_utils.decode_depth_carla :145-167, without the PIL detour)."""
    from PIL import Image

    rgb = np.asarray(Image.open(path).convert("RGB"), np.uint32)
    raw = rgb[..., 0] + rgb[..., 1] * 256 + rgb[..., 2] * 256 * 256
    return (raw.astype(np.float64) / (256**3 - 1) * 1000.0).astype(np.float32)


def encode_depth_carla(depth_m: np.ndarray) -> np.ndarray:
    """Metres -> CARLA RGB uint8 encoding (fixture generation)."""
    raw = np.clip(
        np.round(depth_m.astype(np.float64) / 1000.0 * (256**3 - 1)), 0, 256**3 - 1
    ).astype(np.uint32)
    return np.stack(
        [raw % 256, (raw // 256) % 256, (raw // 65536) % 256], axis=-1
    ).astype(np.uint8)


def sample_augmentation(conf: dict, train: bool, rng=None):
    """LSS aug sampling (camera_utils.sample_augmentation :31-58): returns
    (resize, resize_dims, crop, flip, rotate_deg)."""
    h, w = conf["H"], conf["W"]
    fh, fw = conf["final_dim"]
    if train:
        rng = rng or np.random.default_rng()
        resize = rng.uniform(*conf["resize_lim"])
        resize_dims = (int(w * resize), int(h * resize))
        new_w, new_h = resize_dims
        crop_h = int((1 - rng.uniform(*conf["bot_pct_lim"])) * new_h) - fh
        crop_w = int(rng.uniform(0, max(0, new_w - fw)))
        flip = bool(conf.get("rand_flip")) and bool(rng.integers(0, 2))
        rotate = float(rng.uniform(*conf["rot_lim"]))
    else:
        resize = max(fh / h, fw / w)
        resize_dims = (int(w * resize), int(h * resize))
        new_w, new_h = resize_dims
        crop_h = int((1 - np.mean(conf["bot_pct_lim"])) * new_h) - fh
        crop_w = int(max(0, new_w - fw) / 2)
        flip, rotate = False, 0.0
    crop = (crop_w, crop_h, crop_w + fw, crop_h + fh)
    return resize, resize_dims, crop, flip, rotate


def _rot2(deg: float) -> np.ndarray:
    h = np.radians(deg)
    return np.array(
        [[np.cos(h), np.sin(h)], [-np.sin(h), np.cos(h)]], np.float32
    )


def img_transform(pil_imgs, resize, resize_dims, crop, flip, rotate):
    """Apply the sampled augmentation to PIL images and return the images
    plus the (post_rot2, post_tran2) homography that maps original pixel
    coords to augmented coords (camera_utils.img_transform :61-91)."""
    out = []
    for img in pil_imgs:
        img = img.resize(resize_dims)
        img = img.crop(crop)
        if flip:
            from PIL import Image

            img = img.transpose(method=Image.FLIP_LEFT_RIGHT)
        img = img.rotate(rotate)
        out.append(img)

    post_rot = np.eye(2, dtype=np.float32) * resize
    post_tran = -np.asarray(crop[:2], np.float32)
    if flip:
        a = np.array([[-1, 0], [0, 1]], np.float32)
        b = np.array([crop[2] - crop[0], 0], np.float32)
        post_rot = a @ post_rot
        post_tran = a @ post_tran + b
    a = _rot2(rotate)
    b = np.array([crop[2] - crop[0], crop[3] - crop[1]], np.float32) / 2
    b = a @ (-b) + b
    return out, a @ post_rot, a @ post_tran + b


def normalize_img(pil_img) -> np.ndarray:
    """PIL RGB -> imagenet-normalized (H, W, 3) float32."""
    arr = np.asarray(pil_img.convert("RGB"), np.float32) / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def load_agent_cam_inputs(
    agent_dir: str,
    meta: dict,
    agent_type: str,
    data_aug_conf: dict,
    train: bool,
    rng=None,
    with_depth: bool = True,
):
    """Load + augment all cameras of one agent.

    Returns a dict of numpy arrays: imgs (N, fH, fW, 3[+1]) — channel 3 is
    depth in metres when ``with_depth`` and depth PNGs exist — intrinsics
    (N, 3, 3), rots (N, 3, 3) / trans (N, 3) from the LSS-axes cam->lidar
    matrix, post_rots (N, 3, 3), post_trans (N, 3). Twin of
    intermediate_fusion_dataset.get_item_single_car :490-583.
    """
    from PIL import Image

    keys = CAM_KEYS[agent_type]
    imgs, intrins, rots, trans, post_rots, post_trans = [], [], [], [], [], []
    for key in keys:
        # file stems: "front_camera.png" / "front_depth.png", "bev_camera.png"...
        cam_path = os.path.join(agent_dir, key + ".png")
        if not os.path.isfile(cam_path):
            continue
        depth_path = os.path.join(
            agent_dir, key.replace("camera", "depth") + ".png"
        )
        entry = meta[key]
        intrin = np.asarray(entry["intrinsic"], np.float32).reshape(3, 3)
        cam_to_lidar = ue4_to_lss(
            np.asarray(entry["extrinsic"], np.float32).reshape(4, 4)
        )

        pil_list = [Image.open(cam_path)]
        # channel count must be static: with_depth -> always 4 channels,
        # zero-filled when the depth PNG is absent on disk
        has_depth = with_depth and os.path.isfile(depth_path)
        if has_depth:
            depth_m = decode_depth_carla(depth_path)
            # 16-bit PIL image so crops/resizes track the rgb exactly
            # (decode_depth_carla(to_PIL) + pil_depth_to_tensor round trip)
            scaled = np.clip(depth_m * 65535.0 / 1000.0, 0, 65535).astype(
                np.uint16
            )
            pil_list.append(Image.fromarray(scaled))  # uint16 -> mode I;16

        aug = sample_augmentation(data_aug_conf, train, rng)
        pil_list, post_rot2, post_tran2 = img_transform(pil_list, *aug)

        rgb = normalize_img(pil_list[0])
        if has_depth:
            d = np.asarray(pil_list[1], np.float32) * 1000.0 / 65535.0
            img = np.concatenate([rgb, d[..., None]], axis=-1)
        elif with_depth:
            img = np.concatenate(
                [rgb, np.zeros(rgb.shape[:2] + (1,), np.float32)], axis=-1
            )
        else:
            img = rgb
        post_rot = np.eye(3, dtype=np.float32)
        post_tran = np.zeros(3, np.float32)
        post_rot[:2, :2] = post_rot2
        post_tran[:2] = post_tran2

        imgs.append(img)
        intrins.append(intrin)
        rots.append(cam_to_lidar[:3, :3])
        trans.append(cam_to_lidar[:3, 3])
        post_rots.append(post_rot)
        post_trans.append(post_tran)

    if not imgs:
        return None
    return {
        "imgs": np.stack(imgs).astype(np.float32),
        "intrinsics": np.stack(intrins),
        "rots": np.stack(rots),
        "trans": np.stack(trans),
        "post_rots": np.stack(post_rots),
        "post_trans": np.stack(post_trans),
    }


def depth_discretization_np(d_min, d_max, num_bins, mode) -> np.ndarray:
    """camera_utils.depth_discretization (:301-313), numpy host twin."""
    if mode == "UD":
        return np.linspace(d_min, d_max, num_bins, dtype=np.float64)
    # LID: linearly-increasing bin widths
    idx = np.arange(num_bins, dtype=np.float64)
    delta = 2 * (d_max - d_min) / (num_bins * (1 + num_bins))
    return d_min + delta * idx * (idx + 1) / 2


def project_lidar_depth_map(
    lidar_xyz: np.ndarray,
    intrinsic: np.ndarray,
    extrinsic_ue4: np.ndarray,
    img_hw: tuple,
    depth_discre: np.ndarray,
    final_hw: tuple,
) -> np.ndarray:
    """Lidar cloud -> per-pixel min depth-*level* map for one camera.

    Vectorized twin of the BM2CP dataset's generate_depth_map +
    airv2x_utils.project_lidar_to_cam_single
    (intermediate_fusion_dataset_bm2cp.py:1052-1130, airv2x_utils.py:317-369):
    transform lidar points into the camera (UE4 extrinsic inverse), swap to
    the OpenCV axes ([y, -z, x]), pin-hole project, round-half-up to pixels,
    keep the minimum discretized depth level per pixel, min-pool down to
    ``final_hw``. Empty pixels are -1.
    """
    imgH, imgW = img_hw
    fH, fW = final_hw
    dm_full = np.full((imgH, imgW), np.inf, np.float32)

    if lidar_xyz.shape[0]:
        # the metadata "extrinsic" IS the lidar->camera(ue4) matrix — the
        # reference's ue4_to_lss inverts it to get cam->lidar
        # (camera_utils.py:553-568)
        lidar2cam = np.asarray(extrinsic_ue4, np.float64)
        pts = lidar_xyz[:, :3].astype(np.float64) @ lidar2cam[:3, :3].T
        pts = pts + lidar2cam[:3, 3]
        # UE4 -> OpenCV camera axes (airv2x_utils.py:350)
        cam_pts = np.stack([pts[:, 1], -pts[:, 2], pts[:, 0]], axis=1)
        depth = cam_pts[:, 2]
        uvw = cam_pts @ np.asarray(intrinsic, np.float64).T
        with np.errstate(divide="ignore", invalid="ignore"):
            uv = uvw[:, :2] / depth[:, None]
        # round half up (bm2cp :1072-1074), then (u, v) -> (row, col)
        uv_int = np.floor(uv + 0.5).astype(np.int64)
        col, row = uv_int[:, 0], uv_int[:, 1]
        valid = (
            (depth >= depth_discre[0])
            & (row >= 0) & (row < imgH)
            & (col >= 0) & (col < imgW)
        )
        lvl = np.searchsorted(depth_discre, depth[valid], side="left")
        lvl = np.maximum(lvl, 1) - 1
        np.minimum.at(dm_full, (row[valid], col[valid]), lvl.astype(np.float32))

    # min-pool to the network input resolution (bm2cp :1100-1114)
    sh, sw = imgH // fH, imgW // fW
    if sh >= 1 and sw >= 1 and imgH % fH == 0 and imgW % fW == 0:
        dm = dm_full.reshape(fH, sh, fW, sw).min(axis=(1, 3))
    else:  # non-integer scale: nearest sample
        ys = np.clip((np.arange(fH) * imgH / fH).astype(int), 0, imgH - 1)
        xs = np.clip((np.arange(fW) * imgW / fW).astype(int), 0, imgW - 1)
        dm = dm_full[np.ix_(ys, xs)]
    dm[~np.isfinite(dm)] = -1.0
    return dm.astype(np.float32)


def load_agent_depth_maps(
    agent_dir: str,
    meta: dict,
    agent_type: str,
    lidar_xyz: np.ndarray,
    grid_conf: dict,
    final_hw: tuple,
    cav_to_points: np.ndarray | None = None,
) -> np.ndarray | None:
    """Project one agent's lidar into each of its cameras (BM2CP sample
    assembly, intermediate_fusion_dataset_bm2cp.py:661-679).

    ``lidar_xyz`` may be in a different frame than the agent (proj_first puts
    it in the ego frame); pass ``cav_to_points`` = the cav->points-frame
    transform so the camera extrinsics follow. Returns (Ncam, fH, fW)
    min-depth-level maps (-1 = no lidar return) or None without cameras.
    """
    from PIL import Image

    dd = depth_discretization_np(*grid_conf["ddiscr"], grid_conf["mode"])
    maps = []
    for key in CAM_KEYS[agent_type]:
        cam_path = os.path.join(agent_dir, key + ".png")
        if not os.path.isfile(cam_path):
            continue
        with Image.open(cam_path) as im:
            img_w, img_h = im.size
        extr = np.asarray(meta[key]["extrinsic"], np.float64).reshape(4, 4)
        if cav_to_points is not None:
            # points live in frame P = cav_to_points @ cav, so
            # lidar(P)->cam = (lidar(cav)->cam) @ inv(cav->P)
            extr = extr @ np.linalg.inv(
                np.asarray(cav_to_points, np.float64)
            )
        maps.append(
            project_lidar_depth_map(
                lidar_xyz,
                np.asarray(meta[key]["intrinsic"], np.float64).reshape(3, 3),
                extr,
                (img_h, img_w),
                dd,
                final_hw,
            )
        )
    if not maps:
        return None
    return np.stack(maps)


def _binary_label_map(agent_dir: str, filenames) -> np.ndarray | None:
    """Stack threshold(>10) masks into a class-id map, last layer wins;
    transpose + column flip per basedataset._wrap_segmentation_map."""
    from PIL import Image

    masks = []
    for fn in filenames:
        p = os.path.join(agent_dir, fn)
        if not os.path.isfile(p):
            return None
        arr = np.asarray(Image.open(p).convert("L"))
        masks.append((arr > 10).astype(np.uint8))
    label = np.zeros_like(masks[0])
    for idx, m in enumerate(masks):
        label[m == 1] = idx
    label = label.T
    return np.ascontiguousarray(label[:, ::-1])


def load_seg_labels(agent_dir: str):
    """(dynamic (H, W) uint8 | None, static (H, W) uint8 | None)."""
    return (
        _binary_label_map(agent_dir, DYNAMIC_SEG_FILES),
        _binary_label_map(agent_dir, STATIC_SEG_FILES),
    )


# OPV2V camera conventions (opv2v/basedataset.py:614-660,
# lidar_camera_intermediate_fusion_dataset.py:104-125): four cameras per
# vehicle, files ``<timestamp>_camera{i}.png``, per-camera ``cords`` pose +
# ``intrinsic``; lidar->cam = x1_to_x2(lidar_pose, cam_pose) @ S with the
# axis-swap S below, so cam(LSS)->lidar = inv of that.
_OPV2V_SWAP = np.array(
    [[0, 0, 1, 0], [1, 0, 0, 0], [0, -1, 0, 0], [0, 0, 0, 1]], np.float64
)


def load_opv2v_cam_inputs(
    cav_dir: str,
    stamp: str,
    meta: dict,
    data_aug_conf: dict,
    train: bool,
    rng=None,
):
    """Load + augment an OPV2V vehicle's four cameras into the LSS input
    contract (imgs/intrinsics/rots/trans/post_rots/post_trans), or None when
    no camera files exist."""
    from PIL import Image

    from airv2x_tpu.utils import transforms as tf

    lidar_pose = meta["lidar_pose"]
    imgs, intrins, rots, trans, post_rots, post_trans = [], [], [], [], [], []
    for i in range(4):
        cam_key = f"camera{i}"
        path = os.path.join(cav_dir, f"{stamp}_camera{i}.png")
        if cam_key not in meta or not os.path.isfile(path):
            continue
        entry = meta[cam_key]
        intrin = np.asarray(entry["intrinsic"], np.float32).reshape(3, 3)
        l2c = tf.pose_a_to_b(lidar_pose, entry["cords"]) @ _OPV2V_SWAP
        cam_to_lidar = np.linalg.inv(l2c).astype(np.float32)

        pil = [Image.open(path)]
        aug = sample_augmentation(data_aug_conf, train, rng)
        pil, post_rot2, post_tran2 = img_transform(pil, *aug)
        post_rot = np.eye(3, dtype=np.float32)
        post_tran = np.zeros(3, np.float32)
        post_rot[:2, :2] = post_rot2
        post_tran[:2] = post_tran2

        imgs.append(normalize_img(pil[0]))
        intrins.append(intrin)
        rots.append(cam_to_lidar[:3, :3])
        trans.append(cam_to_lidar[:3, 3])
        post_rots.append(post_rot)
        post_trans.append(post_tran)

    if not imgs:
        return None
    return {
        "imgs": np.stack(imgs).astype(np.float32),
        "intrinsics": np.stack(intrins),
        "rots": np.stack(rots),
        "trans": np.stack(trans),
        "post_rots": np.stack(post_rots),
        "post_trans": np.stack(post_trans),
    }


def stack_cam_slots(cam_slots: dict, num_slots: int) -> dict:
    """(slot -> per-agent cam dict) -> fixed (L, ...) arrays, zero-filled
    outside populated slots. Identity-filled for keys that must stay
    invertible; depth maps use -1 (= no lidar return, never level 0).

    Shared by the AirV2X and OPV2V dataset adapters.
    """
    first = next(iter(cam_slots.values()))
    stacked = {}
    for key, arr in first.items():
        full = np.zeros((num_slots,) + arr.shape, arr.dtype)
        if key in ("post_rots", "intrinsics", "rots"):
            full[...] = np.eye(3, dtype=arr.dtype)
        elif key == "depth_maps":
            full[...] = -1.0
        for slot, cam in cam_slots.items():
            if cam[key].shape != arr.shape:
                raise ValueError(
                    f"camera block '{key}' shape {cam[key].shape} differs "
                    f"from slot 0's {arr.shape} — agents of one type must "
                    "carry the same number of cameras"
                )
            full[slot] = cam[key]
        stacked[key] = full
    return stacked
