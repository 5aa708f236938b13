"""e2e converted-weight parity for the faithful RTNH twin.

Runs the reference's ACTUAL RTNH code (opencood/models/RTNH_intermediate.py,
RTNH_modules/rdr_sp_pw.py, rdr_spcube_head.py forward) against the flax
twin with converted weights. spconv is not installed in this image, so the
reference executes on the dense-emulation spconv backend
(tests/torch_spconv_twin.py) that implements spconv's documented
active-site semantics — the same pattern round 2 sanctioned for the camera
trunks. Both sides consume the SAME voxel list (our pillarize_batch
output), isolating the network parity from voxelizer tie-breaking.

The reference hardcodes the full [-140.8,-40,-3, 140.8,40,1] / 0.4 m radar
grid (rdr_sp_pw.py:22-30), so the test runs the true 10 x 200 x 704
spatial shape with small channel counts.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from tests.reference_stubs import install_reference_stubs, patched_cuda_to_cpu  # noqa: E402

install_reference_stubs()

from tests.torch_spconv_twin import install_spconv_backend  # noqa: E402

install_spconv_backend()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from airv2x_tpu.models import build_model  # noqa: E402
from airv2x_tpu.ops.voxelize import pillarize_batch  # noqa: E402
from airv2x_tpu.utils import torch_convert as tc  # noqa: E402
from tests.test_torch_parity import (  # noqa: E402
    assert_close,
    nhwc,
    randomize_batchnorms,
)

pytestmark = pytest.mark.slow

LR = [-140.8, -40.0, -3.0, 140.8, 40.0, 1.0]
VOX = [0.4, 0.4, 0.4]
GRID = (704, 200, 10)  # x, y, z
L = 2  # agents
NPTS = 400
MAX_VOX = 512

ENC_CH = [4, 8]
BEV_CH = [8, 8]
BEV_K = [3, 6]
BEV_S = [1, 2]
BEV_P = [1, 2]
ANCHOR_NUM = 2


def _torch_cfg():
    return {
        "anchor_num": ANCHOR_NUM,
        "BACKBONE": {
            "ENCODING": {"CHANNEL": ENC_CH, "STRIDE": [2, 2],
                         "PADDING": [1, 1]},
            "TO_BEV": {"IS_Z_EMBED": False, "CHANNEL": BEV_CH,
                       "KERNEL_SIZE": BEV_K, "STRIDE": BEV_S,
                       "PADDING": BEV_P},
        },
        "HEAD": {
            "NAME": "RdrSpcubeHead", "DIM": sum(BEV_CH),
            "BOX_CODE": ["xc", "yc", "zc", "xl", "yl", "zl", "cos", "sin"],
            "BG_WEIGHT": 1.0, "NMS_OVERLAP_THRESHOLD": 0.1,
        },
        "RDR_SP_CUBE": {"GRID_SIZE": 0.4,
                        "ROI": {"z": [-3.0, 1.0], "y": [-40.0, 40.0],
                                "x": [-140.8, 140.8]}},
        "CLASS_INFO": {"CLASS_ID": {"Sedan": 1, "Background": 0},
                       "NUM_CLS": 1},
        "GENERAL": {"LOGGING": {"IS_LOGGING": False}},
        "ANCHOR_GENERATOR_CONFIG": [{
            "class_name": "Sedan",
            "anchor_sizes": [[4.2, 2.1, 2.0]],
            "anchor_rotations": [0, 1.5708],
            "anchor_bottom_heights": [0.0],
            "matched_threshold": 0.5,
            "unmatched_threshold": 0.2,
        }],
    }


def _hypes():
    args = dict(_torch_cfg())
    args["max_cav"] = L
    return {
        "model": {"core_method": "RTNH_intermediate", "args": args},
        "preprocess": {
            "cav_lidar_range": LR,
            "args": {"voxel_size": VOX, "max_voxel_train": MAX_VOX,
                     "max_points_per_voxel": 4},
        },
        "postprocess": {"max_num": 20},
    }


def test_rtnh_e2e_parity():
    rng = np.random.default_rng(3)
    pts = rng.uniform(-1, 1, (1, L, NPTS, 4)).astype(np.float32)
    pts[..., 0] *= 135.0
    pts[..., 1] *= 38.0
    pts[..., 2] = rng.uniform(-2.8, 0.8, (1, L, NPTS))

    hypes = _hypes()
    model = build_model(hypes)
    batch = {
        "radar_points": jnp.asarray(pts),
        "radar_points_mask": jnp.ones((1, L, NPTS), bool),
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((1, L, NPTS), bool),
        "agent_mask": jnp.asarray([[True] * L]),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)},
        batch, train=False,
    )

    from opencood.models.RTNH_intermediate import (  # noqa: E402
        RTNHIntermediate as TorchRTNH,
    )

    with patched_cuda_to_cpu():
        tm = TorchRTNH(_torch_cfg())
    tm.eval()
    torch.manual_seed(0)
    for p in tm.parameters():
        with torch.no_grad():
            p.uniform_(-0.2, 0.2)
    randomize_batchnorms(tm, rng)

    asg = tc.convert_state_dict(tm.state_dict(), variables, _hypes())
    assert not asg.torch_leftovers, asg.torch_leftovers

    out = model.apply(asg.variables, batch, train=False)

    # identical voxel list for the reference (dataset-side voxelization)
    pil = pillarize_batch(
        jnp.asarray(pts.reshape(L, NPTS, 4)),
        jnp.ones((L, NPTS), bool),
        lidar_range=jnp.asarray(LR, jnp.float32),
        voxel_size=jnp.asarray(VOX, jnp.float32),
        grid_size=GRID,
        max_pillars=MAX_VOX,
        max_points_per_pillar=4,
    )
    vox = np.asarray(pil.voxels)  # (L, P, 4, 4)
    coords = np.asarray(pil.coords)  # (L, P, 3) zyx
    npts = np.asarray(pil.num_points)
    mask = np.asarray(pil.mask)
    slot = np.arange(vox.shape[2])[None, None, :]
    vox = np.where((slot < npts[..., None])[..., None], vox, 0.0)

    feats, idxs, nums = [], [], []
    for a in range(L):
        m = mask[a]
        feats.append(vox[a][m])
        c = coords[a][m]
        b = np.full((c.shape[0], 1), a, c.dtype)
        idxs.append(np.concatenate([b, c], axis=1))
        nums.append(npts[a][m])
    data = {
        "processed_radar": {
            "voxel_features": torch.tensor(np.concatenate(feats)),
            "voxel_coords": torch.tensor(np.concatenate(idxs)),
            "voxel_num_points": torch.tensor(np.concatenate(nums)),
        },
        "record_len": torch.tensor([L]),
    }
    with patched_cuda_to_cpu(), torch.no_grad():
        tout = tm(data)

    assert_close(np.asarray(out["psm"]), nhwc(tout["psm"]), what="psm")
    assert_close(np.asarray(out["rm"]), nhwc(tout["rm"]), what="rm")
