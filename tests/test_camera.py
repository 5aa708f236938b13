"""LSS camera branch tests: geometry math + pooling + end-to-end encoder."""

import copy
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airv2x_tpu.config import load_yaml
from airv2x_tpu.models.camera import lss

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_depth_discretization_modes():
    ud = lss.depth_discretization(2, 50, 48, "UD")
    assert len(ud) == 48
    np.testing.assert_allclose(ud[0], 2.0)
    np.testing.assert_allclose(ud[1] - ud[0], 1.0)
    lid = lss.depth_discretization(2, 50, 48, "LID")
    # LID bins grow linearly
    d = np.diff(lid)
    assert (np.diff(d) > 0).all()
    np.testing.assert_allclose(lid[0], 2.0)


def test_create_frustum_shape():
    f = lss.create_frustum((64, 96), 8, (2, 50, 12), "UD")
    assert f.shape == (12, 8, 12, 3)
    assert f[..., 0].max() == 95 and f[..., 1].max() == 63


def test_get_geometry_manual():
    # identity post transforms; check one frustum point manually
    frustum = jnp.asarray(lss.create_frustum((16, 16), 8, (2, 10, 4), "UD"))
    intr = np.eye(3, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = 10.0
    intr[0, 2], intr[1, 2] = 8.0, 8.0
    rots = np.eye(3, dtype=np.float32)[None, None]
    trans = np.array([[[1.0, 2.0, 3.0]]], np.float32)
    geom = lss.get_geometry(
        frustum,
        jnp.asarray(rots),
        jnp.asarray(trans),
        jnp.asarray(intr[None, None]),
        jnp.asarray(np.eye(3, dtype=np.float32)[None, None]),
        jnp.asarray(np.zeros((1, 1, 3), np.float32)),
    )
    u, v, d = np.asarray(frustum[2, 1, 1])
    expected = np.linalg.inv(intr) @ np.array([u * d, v * d, d]) + trans[0, 0]
    np.testing.assert_allclose(np.asarray(geom[0, 0, 2, 1, 1]), expected, atol=1e-4)


def test_voxel_pooling_known_cells():
    dx, bx, nx = lss.gen_dx_bx([-2, 2, 1], [-2, 2, 1], [-1, 1, 2])
    # two points into the same cell, one into another, one out of range
    geom = jnp.asarray(
        np.array(
            [[[[[[-1.5, -1.5, 0.0], [-1.4, -1.6, 0.0], [0.5, 0.5, 0.0],
                 [9.0, 0.0, 0.0]]]]]],
            np.float32,
        )
    )  # (1, 1, 1, 1, 4, 3)
    feats = jnp.ones((1, 1, 1, 1, 4, 2), jnp.float32)
    bev = lss.voxel_pooling(geom, feats, jnp.asarray(dx), jnp.asarray(bx), nx)
    out = np.asarray(bev)  # (1, ny, nx, C)
    assert out.shape == (1, 4, 4, 2)
    assert out[0, 0, 0, 0] == 2.0  # two points summed
    assert out[0, 2, 2, 0] == 1.0
    assert out.sum() == 6.0  # OOR point dropped


@pytest.fixture(scope="module")
def cam_cfg():
    return {
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
        "use_depth_gt": True,
        "depth_supervision": False,
    }


def test_lss_encoder_forward(cam_cfg, rng):
    enc = lss.LSSCameraEncoder(cfg=cam_cfg)
    n_agents, ncam = 2, 2
    imgs = rng.uniform(0, 1, (n_agents, ncam, 64, 96, 4)).astype(np.float32)
    imgs[..., 3] = rng.uniform(5, 45, imgs.shape[:-1])
    intr = np.zeros((n_agents, ncam, 3, 3), np.float32)
    intr[..., 0, 0] = intr[..., 1, 1] = 80.0
    intr[..., 0, 2], intr[..., 1, 2] = 48.0, 32.0
    intr[..., 2, 2] = 1.0
    rots = np.zeros((n_agents, ncam, 3, 3), np.float32)
    rots[..., 0, 2] = 1.0
    rots[..., 1, 0] = -1.0
    rots[..., 2, 1] = -1.0
    cam_inputs = {
        "imgs": jnp.asarray(imgs),
        "intrinsics": jnp.asarray(intr),
        "rots": jnp.asarray(rots),
        "trans": jnp.zeros((n_agents, ncam, 3)),
        "post_rots": jnp.asarray(
            np.broadcast_to(np.eye(3, dtype=np.float32), (n_agents, ncam, 3, 3))
        ),
        "post_trans": jnp.zeros((n_agents, ncam, 3)),
    }
    variables = enc.init(jax.random.PRNGKey(0), cam_inputs, False)
    out = enc.apply(variables, cam_inputs, False)
    assert out.shape == (2, 96, 96, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_camera_model_end_to_end(cam_cfg):
    """Where2comm with cam+lidar modalities on the vehicle branch."""
    from airv2x_tpu.data.synthetic import add_camera_inputs, make_batch
    from airv2x_tpu.models import build_model
    from airv2x_tpu.models.base import SlotLayout

    hypes = load_yaml(os.path.join(REPO, "hypes_yaml/test/tiny_where2comm.yaml"))
    hypes = copy.deepcopy(hypes)
    hypes["model"]["args"]["vehicle"]["modalities"] = ["lidar", "cam"]
    cfg = copy.deepcopy(cam_cfg)
    cfg["img_features"] = 16
    cfg["bevout_feature"] = 16
    hypes["model"]["args"]["vehicle"]["cam"] = cfg

    model = build_model(hypes)
    layout = SlotLayout.from_args(hypes["model"]["args"])
    rng = np.random.default_rng(3)
    batch, _ = make_batch(
        rng,
        layout,
        batch_size=1,
        num_objects=3,
        points_per_agent=512,
        lidar_range=hypes["preprocess"]["cav_lidar_range"],
        max_boxes=50,
        pts_per_box=30,
    )
    add_camera_inputs(
        batch, layout, rng, img_hw=(64, 96), ncam={"vehicle": 2, "rsu": 1, "drone": 1}
    )
    # batch leading dim: stack camera inputs like the rest
    for k in list(batch.keys()):
        if k.startswith("cam_"):
            batch[k] = {kk: vv[None] for kk, vv in batch[k].items()}
    batch = jax.tree.map(jnp.asarray, batch)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)}, batch
    )
    out = model.apply(variables, batch, train=False)
    assert out["psm"].shape == (1, 48, 48, 14)
    assert np.isfinite(np.asarray(out["psm"])).all()
