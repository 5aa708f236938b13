"""Forward-smoke every registered fusion model on tiny shapes."""

import copy
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airv2x_tpu.config import load_yaml
from airv2x_tpu.data.synthetic import make_batch
from airv2x_tpu.models import MODEL_REGISTRY, build_model
from airv2x_tpu.models.base import SlotLayout

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_hypes():
    return load_yaml(os.path.join(REPO, "hypes_yaml/test/tiny_where2comm.yaml"))


def _deep_merge(dst, src):
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_merge(dst[k], v)
        else:
            dst[k] = v


def _patch(hypes, core_method, extra_args):
    h = copy.deepcopy(hypes)
    h["model"]["core_method"] = core_method
    _deep_merge(h["model"]["args"], extra_args)
    return h


VARIANTS = {
    "airv2x_attfusion": {},
    "airv2x_maxfusion": {},
    "airv2x_cobevt": {
        "fax_fusion": {
            "input_dim": 64,
            "mlp_dim": 64,
            "window_size": 4,
            "dim_head": 16,
            "drop_out": 0.0,
            "depth": 1,
            "mask": True,
        }
    },
    "airv2x_v2vnet": {
        "v2vfusion": {
            "voxel_size": [0.4, 0.4, 4],
            "downsample_rate": 4,
            "num_iteration": 1,
            "in_channels": 64,
            "gru_flag": True,
            "agg_operator": "avg",
            "conv_gru": {"H": 48, "W": 48, "kernel_size": [3, 3], "num_layers": 1},
        }
    },
    "airv2x_when2com": {
        "when2com_fusion": {
            "voxel_size": [0.4, 0.4, 4],
            "downsample_rate": 4,
            "num_iteration": 2,
            "in_channels": 64,
            "query_size": 8,
            "key_size": 32,
            "mode": "softmax",
            "H": 48,
            "W": 48,
        }
    },
    "airv2x_heal": {
        "in_head": 64,
        "fusion_backbone": {
            "resnext": True,
            "layer_nums": [2, 2],
            "layer_strides": [1, 2],
            "num_filters": [32, 64],
            "upsample_strides": [1, 2],
            "num_upsample_filter": [32, 32],
            "inplanes": 16,
        },
        "modality_fusion": {
            "base_bev_backbone": {
                "layer_nums": [1],
                "layer_strides": [2],
                "num_filters": [16],
                "upsample_strides": [],
                "num_upsample_filter": [],
            },
            "shrink_header": {
                "use": True,
                "input_dim": 64,
                "dim": [64],
                "kernal_size": [3],
                "stride": [1],
                "padding": [1],
            },
            "compression": 0,
        },
    },
    "airv2x_sicp": {
        "sicp_fusion": {
            "voxel_size": [0.4, 0.4, 4],
            "downsample_rate": 4,
            "in_channels": 64,
            "out_channels": 64,
        }
    },
    "airv2x_stamp": {
        "in_head": 64,
        "fusion_backbone": {
            "resnext": True,
            "layer_nums": [2, 2],
            "layer_strides": [1, 2],
            "num_filters": [32, 64],
            "upsample_strides": [1, 2],
            "num_upsample_filter": [32, 32],
            "inplanes": 16,
        },
        "modality_fusion": {
            "base_bev_backbone": {
                "layer_nums": [1],
                "layer_strides": [2],
                "num_filters": [16],
                "upsample_strides": [],
                "num_upsample_filter": [],
            },
            "shrink_header": {
                "use": True,
                "input_dim": 64,
                "dim": [64],
                "kernal_size": [3],
                "stride": [1],
                "padding": [1],
            },
            "compression": 0,
        },
        "vehicle": {
            "adapter": {
                "core_method": "adapterconvnext",
                "args": {
                    "in_channels": 16,
                    "out_channels": 16,
                    "in_cav_lidar_range": [-19.2, -19.2, -3, 19.2, 19.2, 1],
                    "out_cav_lidar_range": [-19.2, -19.2, -3, 19.2, 19.2, 1],
                    "in_feature_shape": [48, 48],
                    "out_feature_shape": [48, 48],
                    "submodule_args": {"dim": 16, "depth": 1},
                },
            }
        },
    },
    "airv2x_v2xvit": {
        "transformer": {
            "encoder": {
                "num_blocks": 1,
                "depth": 1,
                "use_roi_mask": True,
                "use_RTE": True,
                "RTE_ratio": 2,
                "cav_att_config": {
                    "dim": 64,
                    "use_hetero": True,
                    "use_RTE": True,
                    "RTE_ratio": 2,
                    "heads": 4,
                    "dim_head": 16,
                    "dropout": 0.0,
                },
                "pwindow_att_config": {
                    "dim": 64,
                    "heads": [4, 2],
                    "dim_head": [16, 32],
                    "dropout": 0.0,
                    "window_size": [2, 4],
                    "relative_pos_embedding": True,
                    "fusion_method": "naive",
                },
                "feed_forward": {"mlp_dim": 64, "dropout": 0.0},
                "sttf": {"voxel_size": [0.4, 0.4, 4], "downsample_rate": 4},
            }
        }
    },
}


# where2comm_attn.py twin: multi-head projected per-pixel attention fusion
VARIANTS["airv2x_where2comm"] = {"where2com_fusion": {"attn_heads": 4}}


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_model_forward(name):
    hypes = _patch(_tiny_hypes(), name, VARIANTS[name])
    model = build_model(hypes)
    layout = SlotLayout.from_args(hypes["model"]["args"])
    rng = np.random.default_rng(1)
    batch, _ = make_batch(
        rng,
        layout,
        batch_size=1,
        num_objects=4,
        points_per_agent=1024,
        lidar_range=hypes["preprocess"]["cav_lidar_range"],
        max_boxes=hypes["postprocess"]["max_num"],
        pts_per_box=40,
    )
    batch = jax.tree.map(jnp.asarray, batch)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)}, batch
    )
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert out["psm"].shape == (1, 48, 48, 14)
    assert out["rm"].shape == (1, 48, 48, 14)
    assert np.isfinite(np.asarray(out["psm"])).all()
    assert np.isfinite(np.asarray(out["rm"])).all()


def test_registry_contents():
    for name in VARIANTS:
        assert name in MODEL_REGISTRY
    assert "airv2x_where2comm" in MODEL_REGISTRY


def test_cam_crop_mask_semantics():
    """pyramid_fuse cam_crop_info twin: camera agents keep only the central
    H/ratio - 4 window; lidar agents (ratio <= 0) keep everything."""
    import jax.numpy as jnp

    from airv2x_tpu.models.fusion.pyramid import cam_crop_mask

    ratios = jnp.array([[[0.0, 0.0], [2.0, 2.0]]])  # lidar, camera
    m = np.asarray(cam_crop_mask(32, 32, ratios))[0, :, :, :, 0]
    assert m[0].min() == 1.0  # lidar agent untouched
    # camera: crop dim = 32/2 - 4 = 12 -> rows [10, 22)
    assert m[1].sum() == 12 * 12
    assert m[1, 16, 16] == 1.0 and m[1, 0, 0] == 0.0
    assert m[1, 10, 10] == 1.0 and m[1, 9, 10] == 0.0 and m[1, 22, 10] == 0.0


def test_heal_forward_with_cam_crop():
    hypes = _patch(_tiny_hypes(), "airv2x_heal", VARIANTS["airv2x_heal"])
    model = build_model(hypes)
    layout = SlotLayout.from_args(hypes["model"]["args"])
    rng = np.random.default_rng(3)
    batch, _ = make_batch(
        rng, layout, batch_size=1, num_objects=4, points_per_agent=1024,
        lidar_range=hypes["preprocess"]["cav_lidar_range"],
        max_boxes=hypes["postprocess"]["max_num"], pts_per_box=40,
    )
    L = batch["agent_mask"].shape[1]
    batch["cam_crop_ratios"] = np.zeros((1, L, 2), np.float32)
    batch["cam_crop_ratios"][:, 1:] = 2.0  # non-ego agents camera-cropped
    batch = jax.tree.map(jnp.asarray, batch)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)}, batch
    )
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert np.isfinite(np.asarray(out["psm"])).all()


@pytest.mark.parametrize("variant", ["identity", "adapterconv", "adapterfc",
                                     "adapterconvnext", "adapterdsa"])
def test_adapter_variants(variant):
    from airv2x_tpu.models.fusion.adapter import Adapter

    cfg = {
        "core_method": variant,
        "args": {
            "in_channels": 16,
            "out_channels": 16,
            "in_cav_lidar_range": [-19.2, -19.2, -3, 19.2, 19.2, 1],
            "out_cav_lidar_range": [-19.2, -19.2, -3, 19.2, 19.2, 1],
            "in_feature_shape": [24, 24],
            "out_feature_shape": [24, 24],
            "submodule_args": {"dim": 16, "depth": 1, "n_layers": 1,
                               "num_heads": 4, "num_points": 2},
        },
    }
    mod = Adapter(cfg=cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 24, 24, 16)),
                    jnp.float32)
    v = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(v, x)
    assert y.shape == (2, 24, 24, 16)
    assert np.isfinite(np.asarray(y)).all()


def test_adapter_dsa_zero_init_near_query():
    """With zero-initialized offset/weight kernels the DSA output should be
    finite and reference-grid driven (offsets come only from the ring bias)."""
    from airv2x_tpu.models.fusion.adapter import DSALayer

    layer = DSALayer(out_channels=16, num_heads=4, num_points=2)
    q = jnp.asarray(np.random.default_rng(1).normal(size=(1, 36, 16)),
                    jnp.float32)
    vmap_ = jnp.asarray(np.random.default_rng(2).normal(size=(1, 6, 6, 16)),
                        jnp.float32)
    v = layer.init(jax.random.PRNGKey(0), q, vmap_, (6, 6))
    y = layer.apply(v, q, vmap_, (6, 6))
    assert y.shape == q.shape
    assert np.isfinite(np.asarray(y)).all()
    # residual connection: output differs from query (value samples added)
    assert not np.allclose(np.asarray(y), np.asarray(q))
