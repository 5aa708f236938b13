"""End-to-end forward parity for the flat OPV2V family: the ACTUAL
reference torch model (point_pillar_intermediate.py with AttBEVBackbone)
vs the flax twin with CONVERTED weights, on identical pillars.

This closes the loop the key-coverage tests (test_flat_convert_coverage)
leave open: it proves the flat trunk layout rules AND the per-stage
attention fusion semantics (_PerStageFusionBase) are numerically right.
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
from tests.test_torch_parity import randomize_batchnorms  # noqa: E402

pytestmark = pytest.mark.slow

GRID = 32
L = 2
N_PTS = 600


def _args():
    return {
        "max_cav": L,
        "anchor_number": 2,
        "anchor_num": 2,
        "compression": 0,
        "voxel_size": [0.4, 0.4, 4],
        "lidar_range": [-6.4, -6.4, -3, 6.4, 6.4, 1],
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
        # reference point_pillar_intermediate.py:36-37 hardcodes 128*3 heads
        "base_bev_backbone": {
            "layer_nums": [1, 1, 1],
            "layer_strides": [2, 2, 2],
            "num_filters": [64, 128, 256],
            "upsample_strides": [1, 2, 4],
            "num_upsample_filter": [128, 128, 128],
        },
    }


def _hypes_for(core_method, args):
    return {
        "model": {"core_method": core_method, "args": args},
        "preprocess": {
            "cav_lidar_range": args["lidar_range"],
            "args": {
                "voxel_size": args["voxel_size"],
                "max_voxel_train": 512,
                "max_points_per_voxel": 8,
                "fast_pillars": False,  # classic PFN == reference PillarVFE
            },
        },
        "postprocess": {"max_num": 20},
    }


def _shared_inputs(args, rng):
    """Same pillars in both formats: torch voxel dict + dense-slot batch."""
    from airv2x_tpu.ops.voxelize import pillarize

    lr = args["lidar_range"]
    pts = np.zeros((L, N_PTS, 4), np.float32)
    for a in range(L):
        pts[a, :, 0] = rng.uniform(lr[0], lr[3], N_PTS)
        pts[a, :, 1] = rng.uniform(lr[1], lr[4], N_PTS)
        pts[a, :, 2] = rng.uniform(-2.5, 0.5, N_PTS)
        pts[a, :, 3] = rng.uniform(0, 1, N_PTS)
    mask = np.ones((L, N_PTS), bool)

    vox = [
        pillarize(
            jnp.asarray(pts[a]),
            jnp.asarray(mask[a]),
            lidar_range=jnp.asarray(lr, jnp.float32),
            voxel_size=jnp.asarray(args["voxel_size"], jnp.float32),
            grid_size=(GRID, GRID, 1),
            max_pillars=512,
            max_points_per_pillar=8,
        )
        for a in range(L)
    ]
    vf, npts, co = [], [], []
    for bi in range(L):  # each agent is a torch batch row (sum(record_len))
        m = np.asarray(vox[bi].mask)
        vf.append(np.asarray(vox[bi].voxels)[m])
        npts.append(np.asarray(vox[bi].num_points)[m])
        c = np.asarray(vox[bi].coords)[m]
        co.append(np.concatenate([np.full((len(c), 1), bi, c.dtype), c], 1))
    data_dict = {
        "processed_lidar": {
            "voxel_features": torch.tensor(np.concatenate(vf)),
            "voxel_num_points": torch.tensor(np.concatenate(npts)),
            "voxel_coords": torch.tensor(np.concatenate(co)),
        },
        "record_len": torch.tensor([L]),
        "pairwise_t_matrix": torch.eye(4).repeat(1, L, L, 1, 1),
    }
    batch = {
        "points": jnp.asarray(pts[None]),
        "points_mask": jnp.asarray(mask[None]),
        "agent_mask": jnp.ones((1, L), bool),
        "pairwise_t": jnp.broadcast_to(jnp.eye(4), (1, L, 4, 4)),
        "pairwise_t_full": jnp.broadcast_to(jnp.eye(4), (1, L, L, 4, 4)),
        "prior_encoding": jnp.zeros((1, L, 3)),
    }
    return data_dict, batch


def _e2e_compare(core_method, ref, data_dict, batch, hypes, rng, tol=2e-3):
    randomize_batchnorms(ref, rng)
    with torch.no_grad():
        out_ref = ref(data_dict)

    model = build_model(hypes)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)},
        batch,
    )
    asg = CONVERTERS[core_method](
        {k: v for k, v in ref.state_dict().items()},
        jax.tree.map(np.asarray, dict(variables)),
        hypes,
    )
    assert not asg.skipped, asg.skipped[:6]

    out = model.apply(asg.variables, batch, train=False)
    want_psm = out_ref["psm"].permute(0, 2, 3, 1).numpy()
    want_rm = out_ref["rm"].permute(0, 2, 3, 1).numpy()
    got_psm = np.asarray(out["psm"])
    got_rm = np.asarray(out["rm"])
    assert got_psm.shape == want_psm.shape
    err_p = np.abs(got_psm - want_psm).max()
    err_r = np.abs(got_rm - want_rm).max()
    scale = max(np.abs(want_psm).max(), 1.0)
    assert err_p < tol * scale, f"{core_method} psm e2e mismatch {err_p}"
    assert err_r < tol * scale, f"{core_method} rm e2e mismatch {err_r}"


def test_flat_intermediate_e2e_parity():
    from opencood.models.point_pillar_intermediate import (
        PointPillarIntermediate,
    )

    args = _args()
    rng = np.random.default_rng(17)
    data_dict, batch = _shared_inputs(args, rng)
    torch.manual_seed(21)
    ref = PointPillarIntermediate(args).eval()
    _e2e_compare("point_pillar_intermediate", ref, data_dict, batch,
                 _hypes_for("point_pillar_intermediate", args), rng)


def test_flat_v2vnet_e2e_parity():
    from opencood.models.point_pillar_v2vnet import PointPillarV2VNet

    args = _args()
    args["backbone_fix"] = False
    args["shrink_header"] = {
        "use": True, "input_dim": 384, "dim": [256],
        "kernal_size": [3], "stride": [1], "padding": [1],
    }
    args["v2vfusion"] = {
        "voxel_size": args["voxel_size"],
        "downsample_rate": 1,
        "num_iteration": 2,
        "in_channels": 256,
        "gru_flag": True,
        "agg_operator": "avg",
        "conv_gru": {
            "H": GRID // 2, "W": GRID // 2,
            "kernel_size": [[3, 3]], "num_layers": 1,
        },
    }
    rng = np.random.default_rng(19)
    data_dict, batch = _shared_inputs(args, rng)
    torch.manual_seed(23)
    ref = PointPillarV2VNet(args).eval()
    _e2e_compare("point_pillar_v2vnet", ref, data_dict, batch,
                 _hypes_for("point_pillar_v2vnet", args), rng)


def test_flat_sicp_e2e_parity():
    from opencood.models.point_pillar_sicp import PointPillarSiCP

    args = _args()
    args["backbone_fix"] = False
    args["shrink_header"] = {
        "use": True, "input_dim": 384, "dim": [256],
        "kernal_size": [1], "stride": [1], "padding": [0],
    }
    args["in_channels"] = 512   # pre-doubled cat(rec, sed) width
    args["out_channels"] = 256
    rng = np.random.default_rng(29)
    data_dict, batch = _shared_inputs(args, rng)
    torch.manual_seed(31)
    ref = PointPillarSiCP(args).eval()
    # the reference fusion hardcodes .cuda() (sicp_fuse.py:46,50) — no-op it
    orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        _e2e_compare("point_pillar_sicp", ref, data_dict, batch,
                     _hypes_for("point_pillar_sicp", args), rng)
    finally:
        torch.Tensor.cuda = orig


def test_flat_where2comm_e2e_parity():
    from opencood.models.point_pillar_where2comm import (
        PointPillarWhere2comm as RefW2C,
    )

    args = _args()
    args["backbone_fix"] = False
    args["head_dim"] = 256
    args["shrink_header"] = {
        "use": True, "input_dim": 384, "dim": [256],
        "kernal_size": [3], "stride": [1], "padding": [1],
    }
    args["where2comm_fusion"] = {
        "fully": False,
        "voxel_size": args["voxel_size"],
        "downsample_rate": 1,
        "in_channels": 256,
        "multi_scale": False,
        "agg_operator": {"mode": "ATTEN", "feature_dim": 256},
        "communication": {
            "round": 1,
            "threshold": 0.01,
            "gaussian_smooth": {"k_size": 5, "c_sigma": 1.0},
        },
    }
    rng = np.random.default_rng(37)
    data_dict, batch = _shared_inputs(args, rng)
    torch.manual_seed(41)
    ref = RefW2C(args).eval()
    _e2e_compare("point_pillar_where2comm", ref, data_dict, batch,
                 _hypes_for("point_pillar_where2comm", args), rng)


def test_flat_max_e2e_parity():
    from opencood.models.point_pillar_max import PointPillarMax

    args = _args()
    args["backbone_fix"] = False
    args["shrink_header"] = {
        "use": True, "input_dim": 384, "dim": [256],
        "kernal_size": [3], "stride": [1], "padding": [1],
    }
    args["v2vfusion"] = {"voxel_size": args["voxel_size"],
                         "downsample_rate": 1, "in_channels": 256}
    rng = np.random.default_rng(43)
    data_dict, batch = _shared_inputs(args, rng)
    data_dict["lidar_pose"] = torch.zeros((L, 6))
    torch.manual_seed(47)
    ref = PointPillarMax(args).eval()
    _e2e_compare("point_pillar_max", ref, data_dict, batch,
                 _hypes_for("point_pillar_max", args), rng)
