"""Conversion coverage for the flat OPV2V/V2X-R point_pillar family.

Instantiates the ACTUAL reference torch models (via tests/reference_stubs),
converts their state dicts into the flax twins, and asserts that every
learned tensor landed (no silent 'missing in target' skips, no unconsumed
torch keys). This guards the torch-scope <-> flax-path maps in
airv2x_tpu/utils/torch_convert.py against drift — a path typo turns a
converted checkpoint into random weights without an error otherwise.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from tests.reference_stubs import install_reference_stubs  # noqa: E402

install_reference_stubs()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from airv2x_tpu.models import build_model  # noqa: E402
from airv2x_tpu.utils.torch_convert import CONVERTERS  # noqa: E402

pytestmark = pytest.mark.slow

GRID = 64  # 25.6 / 0.4


def _flat_args(extra=None):
    args = {
        "max_cav": 3,
        "anchor_number": 2,
        "anchor_num": 2,
        "head_dim": 256,
        "backbone_fix": False,
        "compression": 0,
        "voxel_size": [0.4, 0.4, 4],
        "lidar_range": [-12.8, -12.8, -3, 12.8, 12.8, 1],
        "pillar_vfe": {
            "use_norm": True,
            "with_distance": False,
            "use_absolute_xyz": True,
            "num_filters": [64],
        },
        "point_pillar_scatter": {
            "num_features": 64,
            "grid_size": np.array([GRID, GRID, 1]),
        },
        "base_bev_backbone": {
            "layer_nums": [3, 4, 5],
            "layer_strides": [2, 2, 2],
            "num_filters": [64, 128, 256],
            "upsample_strides": [1, 2, 4],
            "num_upsample_filter": [128, 128, 128],
        },
        "shrink_header": {
            "use": True,
            "input_dim": 384,
            "dim": [256],
            "kernal_size": [3],
            "stride": [1],
            "padding": [1],
        },
    }
    args.update(extra or {})
    return args


def _hypes(core_method, args):
    return {
        "model": {"core_method": core_method, "args": args},
        "preprocess": {
            "cav_lidar_range": args["lidar_range"],
            "args": {
                "voxel_size": args["voxel_size"],
                "max_voxel_train": 512,
                "max_points_per_voxel": 8,
                "fast_pillars": True,
            },
        },
        "postprocess": {"max_num": 20},
    }


def _flax_variables(hypes):
    model = build_model(hypes)
    l = hypes["model"]["args"]["max_cav"]
    rng = np.random.default_rng(0)
    pts = rng.uniform(-12, 12, (1, l, 256, 4)).astype(np.float32)
    pts[..., 2] = rng.uniform(-2, 0, (1, l, 256))
    batch = {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((1, l, 256), bool),
        "agent_mask": jnp.asarray([[True] * l]),
        "pairwise_t": jnp.broadcast_to(jnp.eye(4), (1, l, 4, 4)),
        "pairwise_t_full": jnp.broadcast_to(jnp.eye(4), (1, l, l, 4, 4)),
        "prior_encoding": jnp.zeros((1, l, 3)),
    }
    return jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)},
        batch,
    )


def _convert_and_check(core_method, torch_model, hypes,
                       allowed_skips=(), allowed_leftovers=()):
    variables = jax.tree.map(np.asarray, dict(_flax_variables(hypes)))
    sd = {k: v for k, v in torch_model.state_dict().items()}
    asg = CONVERTERS[core_method](sd, variables, hypes)

    def ok(name, allowed):
        return any(a in name for a in allowed)

    bad_skips = [s for s in asg.skipped if not ok(s, allowed_skips)]
    assert not bad_skips, f"{core_method}: silent skips {bad_skips[:8]}"
    left = [k for k in asg.torch_leftovers if not ok(k, allowed_leftovers)]
    assert not left, f"{core_method}: unconsumed torch keys {left[:8]}"
    assert len(asg.assigned) > 20, "suspiciously few tensors assigned"


def test_flat_intermediate_attbackbone():
    from opencood.models.point_pillar_intermediate import (
        PointPillarIntermediate,
    )

    args = _flat_args()
    del args["shrink_header"]  # reference intermediate has no shrink
    torch.manual_seed(0)
    ref = PointPillarIntermediate(args).eval()
    _convert_and_check("point_pillar_intermediate", ref,
                       _hypes("point_pillar_intermediate", args))


def test_flat_where2comm():
    from opencood.models.point_pillar_where2comm import PointPillarWhere2comm

    args = _flat_args({
        "where2comm_fusion": {
            "fully": False,
            "voxel_size": [0.4, 0.4, 4],
            "downsample_rate": 1,
            "in_channels": 256,
            "multi_scale": False,
            "agg_operator": {"mode": "ATTEN", "feature_dim": 256},
            "communication": {
                "round": 1,
                "threshold": 0.01,
                "gaussian_smooth": {"k_size": 5, "c_sigma": 1.0},
            },
        },
    })
    torch.manual_seed(1)
    ref = PointPillarWhere2comm(args).eval()
    # AttenFusion inside Where2comm is param-free scaled-dot attention;
    # the gaussian comm filter is a frozen buffer
    _convert_and_check("point_pillar_where2comm", ref,
                       _hypes("point_pillar_where2comm", args),
                       allowed_leftovers=("fusion_net",))


def test_flat_v2vnet():
    from opencood.models.point_pillar_v2vnet import PointPillarV2VNet

    args = _flat_args({
        "v2vfusion": {
            "voxel_size": [0.4, 0.4, 4],
            "downsample_rate": 1,
            "num_iteration": 2,
            "in_channels": 256,
            "gru_flag": True,
            "agg_operator": "avg",
            "conv_gru": {
                "H": GRID // 2, "W": GRID // 2,
                "kernel_size": [[3, 3]], "num_layers": 1,
            },
        },
    })
    torch.manual_seed(2)
    ref = PointPillarV2VNet(args).eval()
    _convert_and_check("point_pillar_v2vnet", ref,
                       _hypes("point_pillar_v2vnet", args))


def test_flat_sicp():
    from opencood.models.point_pillar_sicp import PointPillarSiCP

    args = _flat_args({"in_channels": 512, "out_channels": 256})
    torch.manual_seed(3)
    ref = PointPillarSiCP(args).eval()
    _convert_and_check("point_pillar_sicp", ref,
                       _hypes("point_pillar_sicp", args))


def test_flat_disconet():
    from opencood.models.point_pillar_disconet import PointPillarDiscoNet

    args = _flat_args()
    del args["shrink_header"]  # reference disconet heads sit at 128*3
    torch.manual_seed(4)
    ref = PointPillarDiscoNet(args).eval()
    _convert_and_check("point_pillar_disconet", ref,
                       _hypes("point_pillar_disconet", args))


def test_flat_disconet_teacher():
    from opencood.models.point_pillar_disconet_teacher import (
        PointPillarDiscoNetTeacher,
    )

    args = _flat_args()
    del args["shrink_header"]
    torch.manual_seed(5)
    ref = PointPillarDiscoNetTeacher(args).eval()
    _convert_and_check("point_pillar_disconet_teacher", ref,
                       _hypes("point_pillar_disconet_teacher", args))


def test_flat_v2xvit():
    from opencood.models.point_pillar_v2xvit import PointPillarV2XVit

    trans = {
        "encoder": {
            "num_blocks": 1,
            "depth": 2,
            "use_roi_mask": True,
            "use_RTE": True,
            "RTE_ratio": 2,
            "cav_att_config": {
                "dim": 256, "use_hetero": True, "use_RTE": True,
                "RTE_ratio": 2, "heads": 8, "dim_head": 32, "dropout": 0.0,
            },
            "pwindow_att_config": {
                "dim": 256, "heads": [16, 8, 4], "dim_head": [16, 32, 64],
                "dropout": 0.0, "window_size": [2, 4, 4],
                "relative_pos_embedding": True,
                "fusion_method": "split_attn",
            },
            "feed_forward": {"mlp_dim": 256, "dropout": 0.0},
            "sttf": {"voxel_size": [0.4, 0.4, 4], "downsample_rate": 4},
        }
    }
    args = _flat_args({"transformer": trans, "max_cav": 2})
    torch.manual_seed(6)
    ref = PointPillarV2XVit(args).eval()
    # relative_position_index / mask buffers are recomputed constants
    _convert_and_check("point_pillar_v2xvit", ref,
                       _hypes("point_pillar_v2xvit", args),
                       allowed_leftovers=("relative_position_index",
                                          "attn_mask"))


def test_flat_cobevt():
    from opencood.models.point_pillar_cobevt import PointPillarCoBEVT

    args = _flat_args({
        "fax_fusion": {
            "input_dim": 256, "mlp_dim": 256, "agent_size": 3,
            "window_size": 4, "dim_head": 32, "drop_out": 0.0,
            "depth": 2, "mask": True,
        },
    })
    torch.manual_seed(7)
    ref = PointPillarCoBEVT(args).eval()
    _convert_and_check("point_pillar_cobevt", ref,
                       _hypes("point_pillar_cobevt", args),
                       allowed_leftovers=("relative_position_index",
                                          "attn_mask"))


def test_flat_when2com():
    from opencood.models.point_pillar_when2com import PointPillarWhen2com

    w2c = {
        "voxel_size": [0.4, 0.4, 4],
        "downsample_rate": 2,
        "in_channels": 256,
        "feat_H": GRID // 2,
        "feat_W": GRID // 2,
        "query_size": 8,
        "key_size": 16,
        "mode": "softmax",
        "H": GRID // 2,
        "W": GRID // 2,
    }
    args = _flat_args({"v2vfusion": w2c, "when2com_fusion": w2c})
    torch.manual_seed(8)
    ref = PointPillarWhen2com(args).eval()
    _convert_and_check("point_pillar_when2com", ref,
                       _hypes("point_pillar_when2com", args))
