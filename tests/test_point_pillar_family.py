"""OPV2V point_pillar family smoke tests (tiny grid)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airv2x_tpu.loss import build_loss
from airv2x_tpu.models import MODEL_REGISTRY, build_model
from airv2x_tpu.models.base import SlotLayout


def _hypes(core_method, extra=None):
    args = {
        "max_cav": 3,
        "anchor_number": 2,
        "pillar_vfe": {
            "use_norm": True,
            "with_distance": False,
            "use_absolute_xyz": True,
            "num_filters": [16],
        },
        "base_bev_backbone": {
            "layer_nums": [1, 1],
            "layer_strides": [2, 2],
            "num_filters": [16, 32],
            "upsample_strides": [1, 2],
            "num_upsample_filter": [16, 16],
        },
        "shrink_header": {
            "use": True,
            "input_dim": 32,
            "dim": [32],
            "kernal_size": [1],
            "stride": [1],
            "padding": [0],
        },
        "compression": 0,
    }
    args.update(extra or {})
    return {
        "model": {"core_method": core_method, "args": args},
        "preprocess": {
            "cav_lidar_range": [-12.8, -12.8, -3, 12.8, 12.8, 1],
            "args": {
                "voxel_size": [0.4, 0.4, 4],
                "max_voxel_train": 512,
                "max_points_per_voxel": 8,
            },
        },
        "postprocess": {"max_num": 20},
        "loss": {
            "core_method": "point_pillar_loss",
            "args": {"cls_weight": 1.0, "reg": 2.0},
        },
    }


def _batch(rng, l=3, n=512):
    pts = rng.uniform(-12, 12, (1, l, n, 4)).astype(np.float32)
    pts[..., 2] = rng.uniform(-2, 0, (1, l, n))
    return {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((1, l, n), bool),
        "agent_mask": jnp.asarray([[True, True, False]]),
        "pairwise_t": jnp.broadcast_to(jnp.eye(4), (1, l, 4, 4)),
        "pairwise_t_full": jnp.broadcast_to(jnp.eye(4), (1, l, l, 4, 4)),
        "prior_encoding": jnp.zeros((1, l, 3)),
    }


EXTRAS = {
    "point_pillar": {},
    "point_pillar_intermediate": {},
    "point_pillar_max": {},
    "point_pillar_disconet": {},
    "point_pillar_where2comm": {
        "where2comm_fusion": {
            "fully": False,
            "communication": {
                "threshold": 0.01,
                "gaussian_smooth": {"k_size": 3, "c_sigma": 1.0},
            },
        }
    },
    "point_pillar_cobevt": {
        "fax_fusion": {
            "input_dim": 32,
            "mlp_dim": 32,
            "window_size": 4,
            "dim_head": 16,
            "drop_out": 0.0,
            "depth": 1,
            "mask": True,
        }
    },
    "point_pillar_v2vnet": {
        "v2vfusion": {
            "voxel_size": [0.4, 0.4, 4],
            "downsample_rate": 2,
            "num_iteration": 1,
            "in_channels": 32,
            "gru_flag": False,
            "agg_operator": "avg",
            "conv_gru": {"H": 32, "W": 32, "kernel_size": [3, 3], "num_layers": 1},
        }
    },
    "point_pillar_when2com": {
        "when2com_fusion": {
            "voxel_size": [0.4, 0.4, 4],
            "downsample_rate": 2,
            "in_channels": 32,
            "query_size": 8,
            "key_size": 16,
            "mode": "softmax",
            "H": 32,
            "W": 32,
        }
    },
}


@pytest.mark.parametrize("name", sorted(EXTRAS))
def test_point_pillar_forward(name):
    hypes = _hypes(name, EXTRAS[name])
    model = build_model(hypes)
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)}, batch
    )
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert out["psm"].shape == (1, 32, 32, 2)
    assert out["rm"].shape == (1, 32, 32, 14)
    assert np.isfinite(np.asarray(out["psm"])).all()


def test_binary_loss():
    hypes = _hypes("point_pillar")
    loss_fn = build_loss(hypes)
    rng = np.random.default_rng(0)
    out = {
        "psm": jnp.asarray(rng.normal(size=(1, 32, 32, 2)).astype(np.float32)),
        "rm": jnp.asarray(rng.normal(size=(1, 32, 32, 14)).astype(np.float32)),
    }
    pos = np.zeros((1, 32, 32, 2), np.float32)
    pos[0, 10, 10, 0] = 1
    target = {
        "pos_equal_one": jnp.asarray(pos),
        "targets": jnp.zeros((1, 32, 32, 14)),
    }
    total, parts = loss_fn(out, target)
    assert np.isfinite(float(total))
    assert "conf_loss" in parts and "reg_loss" in parts


def test_coalign_forward():
    extra = {
        "voxel_size": [0.4, 0.4, 4],
        "res_bev_backbone": {
            "layer_nums": [1, 1],
            "layer_strides": [2, 2],
            "num_filters": [16, 32],
            "upsample_strides": [1, 2],
            "num_upsample_filter": [16, 16],
        },
    }
    hypes = _hypes("point_pillar_coalign", extra)
    del hypes["model"]["args"]["base_bev_backbone"]
    del hypes["model"]["args"]["shrink_header"]
    from airv2x_tpu.models import build_model
    import jax, jax.numpy as jnp
    model = build_model(hypes)
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)}, batch
    )
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert out["psm"].shape == (1, 32, 32, 2)


def test_bm2cp_forward():
    """Faithful Airv2xBM2CP builds from reference-schema args and runs a
    finite forward (veh LidarCam encoder + drone LSS encoder + AttenComm);
    numeric parity lives in test_e2e_parity_more."""
    from airv2x_tpu.data.synthetic import bm2cp_airv2x_batch
    from airv2x_tpu.models import build_model
    import jax, jax.numpy as jnp

    hypes = _bm2cp_hypes()
    model = build_model(hypes)
    batch = jax.tree.map(
        jnp.asarray, bm2cp_airv2x_batch(hypes, np.random.default_rng(1))
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    out = model.apply(variables, batch, train=False)
    assert out["psm"].shape == (1, 16, 16, 14)
    assert np.isfinite(np.asarray(out["psm"])).all()
    assert np.isfinite(float(out["comm_rate"]))


def _bm2cp_hypes():
    lidar_range = [-6.4, -6.4, -3, 6.4, 6.4, 1]
    grid_conf = {
        "xbound": [-6.4, 6.4, 0.4],
        "ybound": [-6.4, 6.4, 0.4],
        "zbound": [-3, 1, 4.0],
        "ddiscr": [2, 50, 6],
        "mode": "LID",
    }
    img_params = {
        "grid_conf": grid_conf,
        "data_aug_conf": {"final_dim": [64, 96]},
        "img_downsample": 8,
        "bev_dim": 64,
        "use_depth_gt": False,
        "depth_supervision": True,
    }
    pc_params = {
        "voxel_size": [0.4, 0.4, 4],
        "lidar_range": lidar_range,
        "pillar_vfe": {
            "use_norm": True, "with_distance": False,
            "use_absolute_xyz": True, "num_filters": [64],
        },
        "point_pillar_scatter": {"num_features": 64},
    }
    args = {
        "ego_type": "vehicle",
        "collaborators": ["vehicle", "drone"],
        "active_sensors": ["lidar"],
        "max_cav": {"vehicle": 1, "rsu": 0, "drone": 1},
        "proj_first": True,
        "supervise_single": False,
        "backbone_fix": False,
        "vehicle": {"img_params": img_params, "pc_params": pc_params},
        "drone": {
            "grid_conf": grid_conf,
            "data_aug_conf": {"final_dim": [64, 96]},
            "img_downsample": 8,
            "img_features": 64,
            "bevout_feature": 64,
            "bev_dim": 64,
            "camera_encoder": "EfficientNet",
            "use_depth_gt": False,
            "depth_supervision": False,
        },
        "modality_fusion": {
            "bev_backbone": {
                "multi_scale": True,
                "layer_nums": [1, 1, 1],
                "layer_strides": [2, 2, 2],
                "num_filters": [64, 128, 256],
                "upsample_strides": [1, 2, 4],
                "num_upsample_filter": [128, 128, 128],
            },
            "shrink_header": {
                "use": True, "input_dim": 384, "dim": [256],
                "kernal_size": [3], "stride": [1], "padding": [1],
            },
            "compression": 0,
        },
        "collaborative_fusion": {
            "voxel_size": [0.4, 0.4, 4],
            "downsample_rate": 1,
            "multi_scale": True,
            "layer_nums": [1, 1, 1],
            "num_filters": [64, 128, 256],
            "agg_operator": {"feature_dim": 256},
        },
        "task": "det",
        "anchor_number": 2,
        "num_class": 7,
        "obj_head": True,
        "outC": 256,
    }
    return {
        "model": {"core_method": "airv2x_bm2cp", "args": args},
        "preprocess": {
            "cav_lidar_range": lidar_range,
            "args": {
                "voxel_size": [0.4, 0.4, 4],
                "max_voxel_train": 512,
                "max_points_per_voxel": 8,
            },
        },
        "postprocess": {"max_num": 20},
    }


def test_early_fusion_forward():
    hypes = _hypes("point_pillar_early", {})
    model = build_model(hypes)
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)}, batch
    )
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert out["psm"].shape == (1, 32, 32, 2)


def test_attresnet_forward():
    hypes = _hypes("point_pillar_attresnet", {})
    model = build_model(hypes)
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)}, batch
    )
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert out["psm"].shape == (1, 32, 32, 2)


def test_spatialcooper_forward():
    hypes = _hypes("point_pillar_spatialcooper", {})
    model = build_model(hypes)
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)}, batch
    )
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert out["psm"].shape == (1, 32, 32, 2)


def test_late_fusion_decode():
    import jax.numpy as jnp
    from airv2x_tpu.data.postprocess import decode_late_fusion
    from airv2x_tpu.ops.anchors import generate_anchor_grid

    aargs = {
        "W": 64, "H": 64, "l": 3.9, "w": 1.6, "h": 1.56, "r": [0, 90],
        "feature_stride": 2, "vw": 0.4, "vh": 0.4,
        "cav_lidar_range": [-12.8, -12.8, -3, 12.8, 12.8, 1],
    }
    anchors = jnp.asarray(generate_anchor_grid(aargs))
    rng = np.random.default_rng(0)
    L, H, W, A = 2, 32, 32, 2
    psm = jnp.asarray(rng.normal(size=(L, H, W, A * 7)).astype(np.float32))
    rm = jnp.asarray(rng.normal(scale=0.05, size=(L, H, W, 7 * A)).astype(np.float32))
    obj = jnp.asarray(rng.normal(size=(L, H, W, A)).astype(np.float32))
    t = jnp.broadcast_to(jnp.eye(4), (L, 4, 4))
    det = decode_late_fusion(
        psm, rm, obj, anchors, t, jnp.asarray([True, True]),
        jnp.asarray(aargs["cav_lidar_range"], jnp.float32),
        num_class=7, obj_threshold=0.2, nms_thresh=0.15, top_k=256,
    )
    assert det.mask.shape == (L * H * W * A,)
    assert np.isfinite(np.asarray(det.scores)).all()


def test_bm2cp_multimodal_fusion_semantics():
    """sensor_blocks MultiModalFusion (:241-315) twin: lidar-only voxels
    keep lidar, thres_map is 0 only where both modalities see the voxel
    (torch numeric parity lives in test_e2e_parity_more)."""
    import jax
    import jax.numpy as jnp

    from airv2x_tpu.models.fusion.bm2cp_flat import MultiModalFusion

    pc = np.zeros((1, 1, 4, 4, 8), np.float32)
    img = np.zeros((1, 1, 4, 4, 8), np.float32)
    pc[0, 0, :2] = 1.0        # rows 0-1: lidar
    img[0, 0, 1:3] = 0.5      # rows 1-2: camera -> row 1 is "both"
    pc, img = jnp.asarray(pc), jnp.asarray(img)

    mod = MultiModalFusion(dim=8)
    v = mod.init(jax.random.PRNGKey(0), img, pc)
    fused, thres, mask = mod.apply(v, img, pc)
    t = np.asarray(thres)[0, ..., 0]
    assert np.all(t[1] == 0.0)            # both modalities
    assert np.all(t[0] == 0.5) and np.all(t[2] == 0.5)
    assert np.all(t[3] == 0.5)            # neither
    # lidar-only row passes lidar features through unchanged
    np.testing.assert_allclose(np.asarray(fused)[0, 0], np.asarray(pc)[0, 0, 0])
    # empty row stays empty
    assert float(jnp.abs(fused[0, 3]).max()) == 0.0
    # mask codes: 1=both, 2=lidar-only, 3=cam-only, 4=neither
    m = np.asarray(mask)[0, ..., 0]
    assert np.all(m[0] == 2) and np.all(m[1] == 1)
    assert np.all(m[2] == 3) and np.all(m[3] == 4)
