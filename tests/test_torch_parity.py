"""Numeric parity vs the actual reference torch modules.

These tests import the reference PyTorch implementations from
/root/reference (torch CPU), copy their randomly-initialised weights into
the flax twins via airv2x_tpu.utils.torch_convert, and assert the outputs
match. This is the load-bearing evidence for the checkpoint converter: if
module-level and end-to-end forward parity holds for converted weights, a
released reference checkpoint converts into an equivalent flax model.

Reference anchors: models/common_modules/{airv2x_pillar_vfe, base_bev_backbone,
downsample_conv, naive_compress}.py, models/where2comm_modules/where2comm_fuse.py,
models/airv2x_where2com.py.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.reference_stubs import install_reference_stubs  # noqa: E402

install_reference_stubs()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from airv2x_tpu.utils import torch_convert as tc  # noqa: E402

pytestmark = pytest.mark.slow

jax.config.update("jax_default_matmul_precision", "highest")


def _bn_randomize(bn, rng):
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(rng.normal(1.0, 0.2, bn.weight.shape[0])))
        bn.bias.copy_(torch.tensor(rng.normal(0.0, 0.2, bn.bias.shape[0])))
        bn.running_mean.copy_(
            torch.tensor(rng.normal(0.0, 0.5, bn.running_mean.shape[0]))
        )
        bn.running_var.copy_(
            torch.tensor(rng.uniform(0.5, 2.0, bn.running_var.shape[0]))
        )


def randomize_batchnorms(module, rng):
    for m in module.modules():
        if isinstance(
            m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)
        ):
            _bn_randomize(m, rng)


def nchw(x):  # flax NHWC -> torch NCHW numpy
    return np.asarray(x).transpose(0, 3, 1, 2)


def nhwc(t):  # torch NCHW -> flax NHWC numpy
    return t.detach().numpy().transpose(0, 2, 3, 1)


def assert_close(a, b, atol=2e-4, rtol=2e-4, what=""):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    err = np.abs(a - b).max()
    assert err <= atol + rtol * np.abs(b).max(), (
        f"{what}: max abs err {err:.3e} (scale {np.abs(b).max():.3e})"
    )


# --------------------------------------------------------------------------


def test_backbone_parity(rng):
    from opencood.models.common_modules.base_bev_backbone import BaseBEVBackbone

    from airv2x_tpu.models.bev_backbone import BaseBEVBackbone as FlaxBackbone

    cfg = {
        "layer_nums": [2, 1],
        "layer_strides": [2, 2],
        "num_filters": [16, 32],
        "upsample_strides": [1, 2],
        "num_upsample_filter": [16, 16],
    }
    torch.manual_seed(0)
    ref = BaseBEVBackbone(cfg, 16).eval()
    randomize_batchnorms(ref, rng)

    model = FlaxBackbone(
        layer_nums=cfg["layer_nums"],
        layer_strides=cfg["layer_strides"],
        num_filters=cfg["num_filters"],
        upsample_strides=cfg["upsample_strides"],
        num_upsample_filters=cfg["num_upsample_filter"],
    )
    x = rng.normal(size=(2, 32, 32, 16)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    asg = tc.Assigner(variables)
    ts = tc.TorchState(ref.state_dict())
    tc.convert_bev_backbone(
        ts, asg, (), layer_nums=cfg["layer_nums"],
        upsample_strides=cfg["upsample_strides"],
    )
    assert not asg.skipped, asg.skipped
    # every flax param leaf must have been written
    from flax.traverse_util import flatten_dict

    n_leaves = sum(len(flatten_dict(variables[c])) for c in variables)
    assert len(asg.assigned) == n_leaves

    with torch.no_grad():
        out_ref = ref({"spatial_features": torch.tensor(nchw(x))})[
            "spatial_features_2d"
        ]
    out, _ = model.apply(asg.variables, jnp.asarray(x), train=False)
    assert_close(nchw(out), out_ref.numpy(), what="backbone 2d")


def test_downsample_conv_parity(rng):
    from opencood.models.common_modules.downsample_conv import DownsampleConv

    from airv2x_tpu.models.nn import DownsampleConv as FlaxDown

    cfg = {
        "input_dim": 24,
        "dim": [16, 16],
        "kernal_size": [3, 1],
        "stride": [2, 1],
        "padding": [1, 0],
    }
    torch.manual_seed(1)
    ref = DownsampleConv(cfg).eval()
    model = FlaxDown(
        dims=cfg["dim"], kernels=cfg["kernal_size"], strides=cfg["stride"],
        paddings=cfg["padding"],
    )
    x = rng.normal(size=(2, 16, 16, 24)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    asg = tc.Assigner(variables)
    tc.convert_downsample_conv(
        tc.TorchState(ref.state_dict()), asg, (), n_layers=len(cfg["dim"])
    )
    assert not asg.skipped, asg.skipped
    with torch.no_grad():
        out_ref = ref(torch.tensor(nchw(x)))
    out = model.apply(asg.variables, jnp.asarray(x))
    assert_close(nchw(out), out_ref.numpy(), what="downsample_conv")


def test_naive_compressor_parity(rng):
    from opencood.models.common_modules.naive_compress import NaiveCompressor

    from airv2x_tpu.models.nn import NaiveCompressor as FlaxComp

    torch.manual_seed(2)
    ref = NaiveCompressor(16, 4).eval()
    randomize_batchnorms(ref, rng)
    model = FlaxComp(16, 4)
    x = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    asg = tc.Assigner(variables)
    tc.convert_naive_compressor(tc.TorchState(ref.state_dict()), asg, ())
    assert not asg.skipped, asg.skipped
    with torch.no_grad():
        out_ref = ref(torch.tensor(nchw(x)))
    out = model.apply(asg.variables, jnp.asarray(x), train=False)
    assert_close(nchw(out), out_ref.numpy(), what="naive_compressor")


def test_pillar_vfe_parity(rng):
    """Reference PillarVFE (ragged M voxels) vs flax PillarVFE (fixed P,
    masked) on identical voxel contents, eval mode."""
    from opencood.models.common_modules.airv2x_pillar_vfe import PillarVFE

    from airv2x_tpu.models.pillar_vfe import PillarVFE as FlaxVFE

    voxel_size = [0.4, 0.4, 4.0]
    lidar_range = [-8.0, -8.0, -3.0, 8.0, 8.0, 1.0]
    cfg = {
        "use_norm": True,
        "with_distance": False,
        "use_absolute_xyz": True,
        "num_filters": [16],
    }
    torch.manual_seed(3)
    ref = PillarVFE(cfg, 4, voxel_size, lidar_range, "vehicle").eval()
    randomize_batchnorms(ref, rng)

    m_real, p_cap, k = 40, 48, 8
    voxels = np.zeros((p_cap, k, 4), np.float32)
    num_points = np.zeros((p_cap,), np.int32)
    coords = np.zeros((p_cap, 3), np.int32)  # zyx
    occupied = rng.choice(40 * 40, size=m_real, replace=False)
    for i, cell in enumerate(occupied):
        cy, cx = divmod(int(cell), 40)
        n = int(rng.integers(1, k + 1))
        num_points[i] = n
        coords[i] = (0, cy, cx)
        base = np.array(
            [lidar_range[0] + (cx + 0.5) * 0.4, lidar_range[1] + (cy + 0.5) * 0.4,
             -1.0, 0.0],
            np.float32,
        )
        voxels[i, :n] = base + rng.normal(0, 0.1, (n, 4)).astype(np.float32)
    pillar_mask = num_points > 0

    batch_dict = {
        "vehicle": {
            "batch_merged_lidar_features_torch": {
                "voxel_features": torch.tensor(voxels[:m_real]),
                "voxel_num_points": torch.tensor(num_points[:m_real]),
                "voxel_coords": torch.tensor(
                    np.concatenate(
                        [np.zeros((m_real, 1), np.int32), coords[:m_real]], axis=1
                    )
                ),
            }
        }
    }
    with torch.no_grad():
        out_ref = ref(batch_dict)["pillar_features"].numpy()  # (M, C)

    model = FlaxVFE(
        num_filters=cfg["num_filters"], voxel_size=voxel_size,
        lidar_range=lidar_range, use_norm=True,
    )
    args = (
        jnp.asarray(voxels), jnp.asarray(num_points), jnp.asarray(coords),
        jnp.asarray(pillar_mask),
    )
    variables = model.init(jax.random.PRNGKey(0), *args, train=False)
    asg = tc.Assigner(variables)
    tc.convert_pillar_vfe(
        tc.TorchState(ref.state_dict()), asg, (), fast=False, num_layers=1
    )
    assert not asg.skipped, asg.skipped
    out = model.apply(asg.variables, *args, train=False)
    assert_close(np.asarray(out)[:m_real], out_ref, what="pillar_vfe")


def test_communication_mask_parity(rng):
    """Eval-mode comm mask: sigmoid -> max -> frozen gaussian -> threshold."""
    from opencood.models.where2comm_modules.where2comm_fuse import Communication

    from airv2x_tpu.models.fusion.where2comm import Communication as FlaxComm

    args = {
        "threshold": 0.35,
        "gaussian_smooth": {"k_size": 5, "c_sigma": 1.0},
    }
    ref = Communication(args).eval()
    l, h, w, ac = 3, 12, 12, 4
    psm = rng.normal(size=(1, l, h, w, ac)).astype(np.float32) * 2

    # reference: list of per-sample (L, AC, H, W) confidence maps
    maps = [torch.tensor(psm[0].transpose(0, 3, 1, 2))]
    with torch.no_grad():
        mask_ref, rate_ref = ref(maps, 1)
    mask_ref = mask_ref.numpy()[:, 0]  # (L, H, W)

    model = FlaxComm(threshold=args["threshold"], smooth=True, k_size=5, c_sigma=1.0)
    agent_mask = jnp.ones((1, l), bool)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(psm), agent_mask, train=False
    )
    mask, rate = model.apply(variables, jnp.asarray(psm), agent_mask, train=False)
    np.testing.assert_array_equal(np.asarray(mask)[0], mask_ref)
    assert abs(float(rate) - float(rate_ref)) < 1e-6


def test_attention_fusion_parity(rng):
    from opencood.models.where2comm_modules.where2comm_fuse import AttentionFusion

    from airv2x_tpu.models.fusion.common import ego_agent_attention

    c, l, h, w = 16, 3, 6, 6
    ref = AttentionFusion(c).eval()
    x = rng.normal(size=(1, l, h, w, c)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.tensor(x[0].transpose(0, 3, 1, 2))).numpy()  # (C, H, W)
    out = ego_agent_attention(jnp.asarray(x), jnp.ones((1, l), bool))
    assert_close(nchw(out)[0], out_ref, what="attention_fusion")


# --------------------------------------------------------------------------
# end-to-end where2comm parity


def _parity_hypes():
    """Small but structurally real where2comm det config (C=64 grid 32x32)."""
    lidar_range = [-6.4, -6.4, -3.0, 6.4, 6.4, 1.0]
    pillar = {
        "use_norm": True,
        "with_distance": False,
        "use_absolute_xyz": True,
        "num_filters": [64],
    }

    def agent(lrange, vsize):
        return {
            "modalities": ["lidar"],
            "lidar": {
                "voxel_size": vsize,
                "lidar_range": lrange,
                "pillar_vfe": dict(pillar),
                "point_pillar_scatter": {
                    "num_features": 64,
                    "grid_size": [32, 32, 1],
                },
            },
        }

    return {
        "name": "parity_where2comm",
        "yaml_parser": "load_airv2x_params",
        "model": {
            "core_method": "airv2x_where2comm",
            "args": {
                "ego_type": "vehicle",
                "collaborators": ["vehicle", "rsu", "drone"],
                "active_sensors": ["lidar"],
                "max_cav": {"vehicle": 2, "rsu": 1, "drone": 1},
                "proj_first": True,
                "backbone_fix": False,
                "vehicle": agent(lidar_range, [0.4, 0.4, 4.0]),
                "rsu": agent([-6.4, -6.4, -30.0, 6.4, 6.4, 30.0], [0.4, 0.4, 60.0]),
                "drone": agent(
                    [-6.4, -6.4, -150.0, 6.4, 6.4, -6.0], [0.4, 0.4, 144.0]
                ),
                "modality_fusion": {
                    "base_bev_backbone": {
                        "layer_nums": [1, 1],
                        "layer_strides": [2, 2],
                        "num_filters": [64, 64],
                        "upsample_strides": [1, 2],
                        "num_upsample_filter": [32, 32],
                    },
                    "shrink_header": {
                        "use": True,
                        "input_dim": 64,
                        "dim": [64],
                        "kernal_size": [1],
                        "stride": [1],
                        "padding": [0],
                    },
                    "compression": 0,
                },
                "where2com_fusion": {
                    "fully": False,
                    "voxel_size": [0.4, 0.4, 4.0],
                    "downsample_rate": 4,
                    "in_channels": 64,
                    "multi_scale": True,
                    "layer_nums": [1, 1],
                    "num_filters": [64, 64],
                    "communication": {
                        "round": 1,
                        "threshold": 0.3,
                        "gaussian_smooth": {"k_size": 5, "c_sigma": 1.0},
                    },
                },
                "task": "det",
                "outC": 64,
                "anchor_number": 2,
                "num_class": 7,
                "obj_head": True,
            },
        },
        "num_class": 7,
        "task": "det",
        "train_params": {
            "batch_size": 1,
            "epoches": 1,
            "max_cav": {"vehicle": 2, "rsu": 1, "drone": 1},
        },
        "preprocess": {
            "core_method": "SpVoxelPreprocessor",
            "cav_lidar_range": lidar_range,
            "args": {
                "voxel_size": [0.4, 0.4, 4.0],
                "max_points_per_voxel": 8,
                "max_voxel_train": 512,
                "max_voxel_test": 512,
                "fast_pillars": False,  # classic path: capped like spconv
            },
            "max_points": 1024,
        },
        "postprocess": {
            "anchor_args": {
                "cav_lidar_range": lidar_range,
                "l": 3.9,
                "w": 1.6,
                "h": 1.56,
                "r": [0, 90],
                "feature_stride": 4,
                "num": 2,
            },
            "target_args": {
                "pos_threshold": 0.6,
                "neg_threshold": 0.45,
                "score_threshold": 0.2,
                "obj_threshold": 0.2,
            },
            "order": "hwl",
            "max_num": 16,
            "nms_thresh": 0.15,
        },
        "optimizer": {"core_method": "Adam", "lr": 1e-3, "args": {}},
        "lr_scheduler": {"core_method": "multistep", "gamma": 0.1,
                         "step_size": [10]},
    }


def _build_e2e_inputs(hypes, rng, prior: np.ndarray | None = None):
    """One fully-occupied 4-agent sample in BOTH input formats: the
    reference's per-type collated data_dict and our dense-slot batch.
    Voxelization is shared so both PFNs see identical pillars."""
    from airv2x_tpu.ops.voxelize import pillarize

    n_pts = 600
    lr = hypes["preprocess"]["cav_lidar_range"]
    pts = np.zeros((4, n_pts, 4), np.float32)
    for a in range(4):
        pts[a, :, 0] = rng.uniform(lr[0], lr[3], n_pts)
        pts[a, :, 1] = rng.uniform(lr[1], lr[4], n_pts)
        pts[a, :, 2] = rng.uniform(-2.5, 0.5, n_pts)
        pts[a, :, 3] = rng.uniform(0, 1, n_pts)
    pts_mask = np.ones((4, n_pts), bool)

    vox = [
        pillarize(
            jnp.asarray(pts[a]),
            jnp.asarray(pts_mask[a]),
            lidar_range=jnp.asarray(lr, jnp.float32),
            voxel_size=jnp.asarray([0.4, 0.4, 4.0], jnp.float32),
            grid_size=(32, 32, 1),
            max_pillars=512,
            max_points_per_pillar=8,
        )
        for a in range(4)
    ]

    def type_dict(agent_ids):
        vf, np_, co = [], [], []
        for bi, a in enumerate(agent_ids):
            m = np.asarray(vox[a].mask)
            vf.append(np.asarray(vox[a].voxels)[m])
            np_.append(np.asarray(vox[a].num_points)[m])
            c = np.asarray(vox[a].coords)[m]
            co.append(np.concatenate([np.full((len(c), 1), bi, c.dtype), c], 1))
        return {
            "batch_merged_lidar_features_torch": {
                "voxel_features": torch.tensor(np.concatenate(vf)),
                "voxel_num_points": torch.tensor(np.concatenate(np_)),
                "voxel_coords": torch.tensor(np.concatenate(co)),
            },
            "batch_idxs": [0],
            "record_len": torch.tensor([len(agent_ids)]),
        }

    if prior is None:
        prior = np.zeros((1, 4, 3), np.float32)
    data_dict = {
        "vehicle": type_dict([0, 1]),
        "rsu": type_dict([2]),
        "drone": type_dict([3]),
        "img_pairwise_t_matrix_collab": torch.eye(4).repeat(1, 4, 4, 1, 1),
        "spatial_correction_matrix": torch.eye(4).repeat(1, 4, 1, 1),
        "prior_encoding": torch.tensor(prior),
    }
    batch = {
        "points": jnp.asarray(pts[None]),
        "points_mask": jnp.asarray(pts_mask[None]),
        "agent_mask": jnp.ones((1, 4), bool),
        "pairwise_t": jnp.broadcast_to(jnp.eye(4), (1, 4, 4, 4)),
        "prior_encoding": jnp.asarray(prior),
    }
    return data_dict, batch


@pytest.fixture(scope="module")
def w2c_setup():
    """Reference torch model + flax twin with converted weights + one batch."""
    # cv2-dependent debug write inside the reference forward (airv2x_where2com
    # .py:137-139) targets ./debug — make sure the dir exists.
    import os

    os.makedirs("debug", exist_ok=True)

    from opencood.models.airv2x_where2com import Airv2xWhere2com

    from airv2x_tpu.models import build_model

    rng = np.random.default_rng(7)
    hypes = _parity_hypes()
    args = hypes["model"]["args"]

    torch.manual_seed(11)
    targs = dict(args)
    targs["where2com_fusion"] = dict(args["where2com_fusion"])
    ref = Airv2xWhere2com(targs).eval()
    randomize_batchnorms(ref, rng)

    data_dict, batch = _build_e2e_inputs(hypes, rng)
    with torch.no_grad():
        out_ref = ref(data_dict)

    model = build_model(hypes)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)},
        batch,
        train=False,
    )
    asg = tc.convert_state_dict(ref.state_dict(), variables, hypes)
    return ref, model, asg, batch, out_ref


def test_where2comm_convert_complete(w2c_setup):
    """Every flax leaf assigned; every torch tensor consumed or explained."""
    from flax.traverse_util import flatten_dict

    ref, model, asg, batch, out_ref = w2c_setup
    assert not asg.skipped, asg.skipped
    n_leaves = sum(len(flatten_dict(asg.variables[c])) for c in asg.variables)
    assert len(asg.assigned) == n_leaves, (
        f"assigned {len(asg.assigned)} of {n_leaves} flax leaves"
    )
    # every torch tensor was consumed (fusion-net frozen constants included)
    assert asg.torch_leftovers == [], asg.torch_leftovers


def test_where2comm_e2e_parity(w2c_setup):
    ref, model, asg, batch, out_ref = w2c_setup
    out = model.apply(asg.variables, batch, train=False)
    assert_close(
        nchw(out["psm"]), out_ref["psm"].numpy(), atol=1e-3, rtol=1e-3,
        what="e2e psm",
    )
    assert_close(
        nchw(out["rm"]), out_ref["rm"].numpy(), atol=1e-3, rtol=1e-3,
        what="e2e rm",
    )
    assert_close(
        nchw(out["obj"]), out_ref["obj"].numpy(), atol=1e-3, rtol=1e-3,
        what="e2e obj",
    )
    assert abs(float(out["comm_rate"]) - float(out_ref["com"])) < 1e-5


def test_convert_checkpoint_cli(w2c_setup, tmp_path, monkeypatch):
    """Full round trip through the CLI: .pth -> run dir -> orbax restore ->
    identical outputs."""
    ref, model, asg, batch, out_ref = w2c_setup

    from airv2x_tpu.config import save_yaml
    from airv2x_tpu.parallel.train import create_train_state, make_optimizer
    from airv2x_tpu.tools import convert_checkpoint
    from airv2x_tpu.utils.checkpoint import load_checkpoint

    ckpt = tmp_path / "net_epoch50.pth"
    torch.save({"model_state_dict": ref.state_dict()}, ckpt)
    cfg = tmp_path / "config.yaml"
    save_yaml(_parity_hypes(), str(cfg))
    out_dir = tmp_path / "converted"

    monkeypatch.setattr(
        sys, "argv",
        ["convert_checkpoint", "--checkpoint", str(ckpt), "--hypes_yaml",
         str(cfg), "--output", str(out_dir)],
    )
    convert_checkpoint.main()

    tx, _ = make_optimizer(_parity_hypes())
    variables = {"params": asg.variables["params"],
                 "batch_stats": asg.variables["batch_stats"]}
    template = create_train_state(model, jax.tree.map(np.zeros_like, variables),
                                  tx)
    state = load_checkpoint(str(out_dir), 1, jax.device_get(template))
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch, train=False,
    )
    assert_close(
        nchw(out["psm"]), out_ref["psm"].numpy(), atol=1e-3, rtol=1e-3,
        what="cli psm",
    )


# --------------------------------------------------------------------------
# when2com fusion parity


def test_when2com_fusion_parity(rng):
    """Reference When2comFusion (policy conv net, key/query MLPs, MIMO
    attention) vs When2comFusion on identical features with identity
    transforms — converted weights, eval mode."""
    from opencood.models.when2com_modules.when2com import When2comFusion

    from airv2x_tpu.models.fusion.when2com import When2comFusion as FlaxW2C

    h, w, c = 16, 32, 32
    args = {
        "voxel_size": [0.4, 0.4, 4],
        "downsample_rate": 2,
        "in_channels": c,
        "H": h,
        "W": w,
        "query_size": 8,
        "key_size": 32,
        "mode": "softmax",
    }
    torch.manual_seed(21)
    ref = When2comFusion(args).eval()
    randomize_batchnorms(ref, rng)

    l = 3
    x = rng.normal(size=(1, l, h, w, c)).astype(np.float32)
    with torch.no_grad():
        out_ref, _ = ref(
            torch.tensor(x[0].transpose(0, 3, 1, 2)),
            torch.tensor([l]),
            torch.eye(4).repeat(1, l, l, 1, 1),
        )
    out_ref = out_ref.numpy()[0]  # ego row, (C, H, W)

    model = FlaxW2C(args=args)
    batch_args = (
        jnp.asarray(x),
        jnp.ones((1, l), bool),
        jnp.broadcast_to(jnp.eye(4), (1, l, l, 4, 4)),
    )
    variables = model.init(jax.random.PRNGKey(0), *batch_args, train=False)

    ts = tc.TorchState(ref.state_dict())
    asg = tc.Assigner(variables)
    feat_hw = (h // 4, w // 4)
    tc.convert_policy_net(ts.sub("query_key_net"), asg, ("PolicyNet_0",))
    tc.convert_km_generator(
        ts.sub("key_net"), asg, ("key_net",), feat_hw=feat_hw
    )
    tc.convert_km_generator(
        ts.sub("query_net"), asg, ("query_net",), feat_hw=feat_hw
    )
    tc.convert_linear(ts, asg, ("Dense_0",), scope="attention_net.linear")
    assert not asg.skipped, asg.skipped
    from flax.traverse_util import flatten_dict

    n_leaves = sum(len(flatten_dict(variables[col])) for col in variables)
    assert len(asg.assigned) == n_leaves

    out = model.apply(asg.variables, *batch_args, train=False)
    assert_close(
        np.asarray(out)[0].transpose(2, 0, 1), out_ref, atol=1e-3, rtol=1e-3,
        what="when2com fused",
    )


def test_cobevt_swap_fusion_parity(rng):
    """Reference SwapFusionBlockMask encoder vs SwapFusionEncoder on
    identical features with a full mask, converted weights."""
    from opencood.models.cobevt_modules.swap_fusion_modules import (
        SwapFusionEncoder,
    )

    from airv2x_tpu.models.fusion.cobevt import SwapFusionEncoder as FlaxSwap

    args = {
        "input_dim": 32,
        "mlp_dim": 32,
        "agent_size": 3,
        "window_size": 4,
        "dim_head": 16,
        "drop_out": 0.0,
        "depth": 2,
        "mask": True,
    }
    torch.manual_seed(31)
    ref = SwapFusionEncoder(args).eval()

    b, l, h, w, c = 1, 3, 8, 8, 32
    x = rng.normal(size=(b, l, h, w, c)).astype(np.float32)
    mask_t = torch.ones(b, h, w, 1, l)
    with torch.no_grad():
        out_ref = ref(
            torch.tensor(x.transpose(0, 1, 4, 2, 3)), mask_t
        ).numpy()  # (B, C, H, W)

    model = FlaxSwap(args=args)
    am = jnp.ones((b, l), bool)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), am,
                           train=False)
    ts = tc.TorchState(ref.state_dict())
    asg = tc.Assigner(variables)
    tc.convert_swap_fusion(ts, asg, (), depth=args["depth"])
    assert not asg.skipped, asg.skipped
    from flax.traverse_util import flatten_dict

    n_leaves = sum(len(flatten_dict(variables[col])) for col in variables)
    assert len(asg.assigned) == n_leaves
    assert ts.leftovers() == []

    out = model.apply(asg.variables, jnp.asarray(x), am, train=False)
    assert_close(
        nchw(out), out_ref, atol=1e-3, rtol=1e-3, what="cobevt fused"
    )


@pytest.mark.parametrize("fusion_method", ["naive", "split_attn"])
def test_v2xvit_transformer_parity(rng, fusion_method):
    """Reference V2XTransformer (RTE + STTF + HGT + pyramid windows +
    naive/split-attn fusion + FF) vs V2XTransformer on identical features
    with identity transforms, converted weights."""
    from opencood.models.v2xvit_modules.v2xvit_basic import V2XTransformer

    from airv2x_tpu.models.fusion.v2xvit import V2XTransformer as FlaxV2XT

    # the reference SplitAttn hard-codes dim 256 (split_attn.py:47)
    dim = 256 if fusion_method == "split_attn" else 32
    heads = [4, 2, 2] if fusion_method == "split_attn" else [4, 2]
    dim_heads = (
        [64, 128, 128] if fusion_method == "split_attn" else [8, 16]
    )
    windows = [2, 4, 8] if fusion_method == "split_attn" else [2, 4]
    enc = {
        "num_blocks": 1,
        "depth": 1,
        "use_roi_mask": False,
        "use_RTE": True,
        "RTE_ratio": 2,
        "cav_att_config": {
            "dim": dim,
            "use_hetero": True,
            "use_RTE": True,
            "RTE_ratio": 2,
            "heads": 4,
            "dim_head": dim // 4,
            "dropout": 0.0,
        },
        "pwindow_att_config": {
            "dim": dim,
            "heads": heads,
            "dim_head": dim_heads,
            "dropout": 0.0,
            "window_size": windows,
            "relative_pos_embedding": True,
            "fusion_method": fusion_method,
        },
        "feed_forward": {"mlp_dim": dim, "dropout": 0.0},
        "sttf": {"voxel_size": [0.4, 0.4, 4], "downsample_rate": 2},
    }
    torch.manual_seed(41)
    ref = V2XTransformer({"encoder": enc}).eval()

    b, l, h, w = 1, 3, 8, 8
    x = rng.normal(size=(b, l, h, w, dim)).astype(np.float32)
    # prior encoding per agent: velocity, dt, infra-type
    prior = np.zeros((b, l, 3), np.float32)
    prior[:, :, 1] = [0, 1, 2]  # time delays
    prior[:, :, 2] = [0, 1, 0]  # hetero types
    prior_maps = np.broadcast_to(prior[:, :, None, None, :], (b, l, h, w, 3))

    x_with_prior = np.concatenate([x, prior_maps], axis=-1)
    mask_t = torch.ones(b, l)  # no-roi path: (B, L), v2xvit_basic.py:186
    eye = torch.eye(4).repeat(b, l, 1, 1)

    # hmsa.py:137 calls torch.einsum(eq, [ops]) — the deprecated list form
    # this torch version rejects; shim it for the reference call only
    orig_einsum = torch.einsum

    def einsum_shim(eq, *ops):
        if len(ops) == 1 and isinstance(ops[0], (list, tuple)):
            return orig_einsum(eq, *ops[0])
        return orig_einsum(eq, *ops)

    import opencood.models.v2xvit_modules.hmsa as hmsa_mod

    hmsa_mod.torch.einsum = einsum_shim  # hmsa uses torch.einsum at call time
    torch.einsum = einsum_shim
    try:
        with torch.no_grad():
            out_ref = ref(
                torch.tensor(x_with_prior), mask_t, eye
            ).numpy()  # (B, H, W, C) ego
    finally:
        torch.einsum = orig_einsum

    model = FlaxV2XT(args={"encoder": enc})
    batch_args = (
        jnp.asarray(x),
        jnp.ones((b, l), bool),
        jnp.broadcast_to(jnp.eye(4), (b, l, 4, 4)),
        jnp.asarray(prior),
    )
    variables = model.init(jax.random.PRNGKey(0), *batch_args, train=False)
    ts = tc.TorchState(ref.state_dict())
    asg = tc.Assigner(variables)
    tc.convert_v2xt_encoder(
        ts.sub("encoder"), asg, ("V2XTEncoder_0",), enc
    )
    assert not asg.skipped, asg.skipped
    assert ts.leftovers() == [], ts.leftovers()
    from flax.traverse_util import flatten_dict

    n_leaves = sum(len(flatten_dict(variables[col])) for col in variables)
    assert len(asg.assigned) == n_leaves

    out = model.apply(asg.variables, *batch_args, train=False)
    assert_close(
        np.asarray(out), out_ref, atol=2e-3, rtol=2e-3, what="v2xvit fused"
    )


def test_v2xvit_e2e_parity(rng):
    """Full Airv2xV2XViT forward parity with converted weights: encoder ->
    backbone -> shrink -> regroup+prior -> V2XTransformer -> heads."""
    from opencood.models.airv2x_v2xvit import Airv2xV2XVit

    from airv2x_tpu.models import build_model

    hypes = _parity_hypes()
    dim = 64
    hypes["model"]["core_method"] = "airv2x_v2xvit"
    args = hypes["model"]["args"]
    del args["where2com_fusion"]
    args["transformer"] = {
        "encoder": {
            "num_blocks": 1,
            "depth": 1,
            "use_roi_mask": False,
            "use_RTE": True,
            "RTE_ratio": 2,
            "cav_att_config": {
                "dim": dim,
                "use_hetero": True,
                "use_RTE": True,
                "RTE_ratio": 2,
                "heads": 4,
                "dim_head": 16,
                "dropout": 0.0,
            },
            "pwindow_att_config": {
                "dim": dim,
                "heads": [4, 2],
                "dim_head": [16, 32],
                "dropout": 0.0,
                "window_size": [2, 4],
                "relative_pos_embedding": True,
                "fusion_method": "naive",
            },
            "feed_forward": {"mlp_dim": dim, "dropout": 0.0},
            "sttf": {"voxel_size": [0.4, 0.4, 4.0], "downsample_rate": 4},
        }
    }

    torch.manual_seed(51)
    ref = Airv2xV2XVit(dict(args)).eval()
    randomize_batchnorms(ref, rng)

    srng = np.random.default_rng(13)
    prior = np.zeros((1, 4, 3), np.float32)
    prior[0, :, 0] = srng.uniform(0, 0.5, 4)  # velocity
    prior[0, :, 1] = [0, 1, 0, 2]  # time delays
    prior[0, :, 2] = [0, 0, 1, 0]  # infra flags (types)
    data_dict, batch = _build_e2e_inputs(hypes, srng, prior=prior)

    import opencood.models.v2xvit_modules.hmsa as hmsa_mod

    orig_einsum = torch.einsum

    def einsum_shim(eq, *ops):
        if len(ops) == 1 and isinstance(ops[0], (list, tuple)):
            return orig_einsum(eq, *ops[0])
        return orig_einsum(eq, *ops)

    torch.einsum = einsum_shim
    try:
        with torch.no_grad():
            out_ref = ref(data_dict)
    finally:
        torch.einsum = orig_einsum

    model = build_model(hypes)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)},
        batch,
        train=False,
    )
    asg = tc.convert_state_dict(ref.state_dict(), variables, hypes)
    assert not asg.skipped, asg.skipped
    assert asg.torch_leftovers == [], asg.torch_leftovers
    from flax.traverse_util import flatten_dict

    n_leaves = sum(len(flatten_dict(asg.variables[c])) for c in asg.variables)
    assert len(asg.assigned) == n_leaves

    out = model.apply(asg.variables, batch, train=False)
    assert_close(
        nchw(out["psm"]), out_ref["psm"].numpy(), atol=2e-3, rtol=2e-3,
        what="v2xvit e2e psm",
    )
    assert_close(
        nchw(out["rm"]), out_ref["rm"].numpy(), atol=2e-3, rtol=2e-3,
        what="v2xvit e2e rm",
    )


def test_cobevt_e2e_parity(rng):
    """Full Airv2xCoBEVT forward parity with converted weights."""
    from opencood.models.airv2x_cobevt import Airv2xCoBEVT

    from airv2x_tpu.models import build_model

    hypes = _parity_hypes()
    hypes["model"]["core_method"] = "airv2x_cobevt"
    args = hypes["model"]["args"]
    del args["where2com_fusion"]
    # the reference cobevt reads the trunk keys at the args TOP level, not
    # under modality_fusion (airv2x_cobevt.py:37-48) — mirror its config
    # layout for both sides
    mod = args.pop("modality_fusion")
    args["base_bev_backbone"] = mod["base_bev_backbone"]
    args["shrink_header"] = mod["shrink_header"]
    args["compression"] = mod["compression"]
    args["fax_fusion"] = {
        "input_dim": 64,
        "mlp_dim": 64,
        "window_size": 4,
        "dim_head": 16,
        "drop_out": 0.0,
        "depth": 2,
        "mask": True,
    }
    args["max_cav_num"] = 4  # injected by load_airv2x_params upstream

    torch.manual_seed(61)
    ref = Airv2xCoBEVT(dict(args)).eval()
    randomize_batchnorms(ref, rng)

    srng = np.random.default_rng(17)
    data_dict, batch = _build_e2e_inputs(hypes, srng)
    with torch.no_grad():
        out_ref = ref(data_dict)

    model = build_model(hypes)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)},
        batch,
        train=False,
    )
    asg = tc.convert_state_dict(ref.state_dict(), variables, hypes)
    assert not asg.skipped, asg.skipped
    assert asg.torch_leftovers == [], asg.torch_leftovers

    out = model.apply(asg.variables, batch, train=False)
    assert_close(
        nchw(out["psm"]), out_ref["psm"].numpy(), atol=2e-3, rtol=2e-3,
        what="cobevt e2e psm",
    )
    assert_close(
        nchw(out["rm"]), out_ref["rm"].numpy(), atol=2e-3, rtol=2e-3,
        what="cobevt e2e rm",
    )


def test_when2com_e2e_parity(rng):
    """Full Airv2xWhen2com forward parity with converted weights."""
    from opencood.models.airv2x_when2com import Airv2xWhen2com

    from airv2x_tpu.models import build_model

    hypes = _parity_hypes()
    hypes["model"]["core_method"] = "airv2x_when2com"
    args = hypes["model"]["args"]
    del args["where2com_fusion"]
    # backbone stages on the 32x32 grid give 16x16 and 8x8; the deblocks
    # upsample both to the FIRST stage's 16x16 before concat + shrink
    args["when2com_fusion"] = {
        "voxel_size": [0.4, 0.4, 4.0],
        "downsample_rate": 2,
        "in_channels": 64,
        "H": 16,
        "W": 16,
        "query_size": 8,
        "key_size": 32,
        "mode": "softmax",
    }

    torch.manual_seed(71)
    ref = Airv2xWhen2com(dict(args)).eval()
    randomize_batchnorms(ref, rng)

    srng = np.random.default_rng(19)
    data_dict, batch = _build_e2e_inputs(hypes, srng)
    batch["pairwise_t_full"] = jnp.broadcast_to(jnp.eye(4), (1, 4, 4, 4, 4))
    with torch.no_grad():
        out_ref = ref(data_dict)

    model = build_model(hypes)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)},
        batch,
        train=False,
    )
    asg = tc.convert_state_dict(ref.state_dict(), variables, hypes)
    assert not asg.skipped, asg.skipped
    assert asg.torch_leftovers == [], asg.torch_leftovers

    out = model.apply(asg.variables, batch, train=False)
    assert_close(
        nchw(out["psm"]), out_ref["psm"].numpy(), atol=2e-3, rtol=2e-3,
        what="when2com e2e psm",
    )
    assert_close(
        nchw(out["rm"]), out_ref["rm"].numpy(), atol=2e-3, rtol=2e-3,
        what="when2com e2e rm",
    )


def test_v2vnet_fusion_parity(rng):
    """Reference V2VNetFusion (msg conv + zero-hidden ConvGRU + MLP) vs
    V2VNetFusion on identical features, identity transforms, converted
    weights."""
    from opencood.models.v2vnet_modules.v2v_fuse import V2VNetFusion

    from airv2x_tpu.models.fusion.v2vnet import V2VNetFusion as FlaxV2V

    h, w, c = 16, 16, 32
    args = {
        "voxel_size": [0.4, 0.4, 4],
        "downsample_rate": 2,
        "num_iteration": 2,
        "in_channels": c,
        "gru_flag": True,
        "agg_operator": "avg",
        "conv_gru": {"H": h, "W": w, "kernel_size": [[3, 3]], "num_layers": 1},
    }
    torch.manual_seed(81)
    ref = V2VNetFusion(args).eval()

    l = 3
    x = rng.normal(size=(1, l, h, w, c)).astype(np.float32)
    with torch.no_grad():
        out_ref, _ = ref(
            torch.tensor(x[0].transpose(0, 3, 1, 2)),
            torch.tensor([l]),
            torch.eye(4).repeat(1, l, l, 1, 1),
        )
    out_ref = out_ref.numpy()[0]  # (C, H, W)

    model = FlaxV2V(args=args)
    batch_args = (
        jnp.asarray(x),
        jnp.ones((1, l), bool),
        jnp.broadcast_to(jnp.eye(4), (1, l, l, 4, 4)),
    )
    variables = model.init(jax.random.PRNGKey(0), *batch_args, train=False)
    ts = tc.TorchState(ref.state_dict())
    asg = tc.Assigner(variables)
    tc.convert_v2vnet_fusion(ts, asg, ())
    assert not asg.skipped, asg.skipped
    assert ts.leftovers() == [], ts.leftovers()
    from flax.traverse_util import flatten_dict

    n_leaves = sum(len(flatten_dict(variables[col])) for col in variables)
    assert len(asg.assigned) == n_leaves

    out = model.apply(asg.variables, *batch_args, train=False)
    assert_close(
        np.asarray(out)[0].transpose(2, 0, 1), out_ref, atol=1e-3, rtol=1e-3,
        what="v2vnet fused",
    )


def test_heal_pyramid_parity(rng):
    """Reference PyramidFusion.forward_single (ResNeXt trunk + occupancy
    heads + multiscale decode) vs PyramidFusion.forward_single with
    converted weights."""
    from opencood.models.fuse_modules.pyramid_fuse import PyramidFusion

    from airv2x_tpu.models.fusion.pyramid import PyramidFusion as FlaxPyramid

    cfg = {
        "resnext": True,
        "layer_nums": [2, 2],
        "layer_strides": [1, 2],
        "num_filters": [32, 64],
        "upsample_strides": [1, 2],
        "num_upsample_filter": [32, 32],
        "inplanes": 32,
        "anchor_number": 2,
    }
    torch.manual_seed(91)
    ref = PyramidFusion(cfg, input_channels=32).eval()
    randomize_batchnorms(ref, rng)

    x = rng.normal(size=(2, 16, 16, 32)).astype(np.float32)
    with torch.no_grad():
        final_ref, occ_ref = ref.forward_single(torch.tensor(nchw(x)))

    model = FlaxPyramid(args=cfg, inplanes=32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), train=False,
        method=FlaxPyramid.forward_single,
    )
    ts = tc.TorchState(ref.state_dict())
    asg = tc.Assigner(variables)
    tc.convert_pyramid_fusion(ts, asg, (), cfg)
    assert not asg.skipped, asg.skipped
    assert ts.leftovers() == [], ts.leftovers()
    from flax.traverse_util import flatten_dict

    n_leaves = sum(len(flatten_dict(variables[col])) for col in variables)
    assert len(asg.assigned) == n_leaves

    final, occ = model.apply(
        asg.variables, jnp.asarray(x), train=False,
        method=FlaxPyramid.forward_single,
    )
    assert_close(
        nchw(final), final_ref.numpy(), atol=1e-3, rtol=1e-3,
        what="pyramid decoded",
    )
    for i, (o, o_ref) in enumerate(zip(occ, occ_ref)):
        assert_close(
            nchw(o), o_ref.numpy(), atol=1e-3, rtol=1e-3,
            what=f"occ map {i}",
        )


def test_stamp_convnext_adapter_parity(rng):
    """Reference AdapterConvNext vs flax twin with converted weights
    (identity geometry so only the conv/ConvNeXt math is exercised)."""
    from opencood.models.fuse_modules.adapter import AdapterConvNext

    from airv2x_tpu.models.fusion.adapter import (
        AdapterConvNext as FlaxAdapter,
    )

    args = {
        "in_channels": 32,
        "out_channels": 32,
        "in_cav_lidar_range": [-19.2, -19.2, -3, 19.2, 19.2, 1],
        "out_cav_lidar_range": [-19.2, -19.2, -3, 19.2, 19.2, 1],
        "in_feature_shape": [16, 16],
        "out_feature_shape": [16, 16],
        "submodule_args": {"num_of_blocks": 2, "dim": 32},
    }
    torch.manual_seed(101)
    ref = AdapterConvNext(**args).eval()

    x = rng.normal(size=(2, 16, 16, 32)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.tensor(nchw(x))).numpy()

    model = FlaxAdapter(args=args)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    ts = tc.TorchState(ref.state_dict())
    asg = tc.Assigner(variables)
    tc.convert_convnext_adapter(ts, asg, (), 2)
    assert not asg.skipped, asg.skipped
    assert ts.leftovers() == [], ts.leftovers()
    from flax.traverse_util import flatten_dict

    n_leaves = sum(len(flatten_dict(variables[col])) for col in variables)
    assert len(asg.assigned) == n_leaves

    out = model.apply(asg.variables, jnp.asarray(x), train=False)
    assert_close(
        nchw(out), out_ref, atol=1e-3, rtol=1e-3, what="convnext adapter"
    )


def test_sicp_fusion_parity(rng):
    """Reference MultiSpatialFusion vs SpatialFusion on identical features,
    identity transforms, converted weights, 3 agents (multi-sender mean)."""
    from opencood.models.sicpfuse_modules.multiagent_sicp_fuse import (
        MultiSpatialFusion,
    )

    from airv2x_tpu.models.fusion.sicp import SpatialFusion

    h, w, c = 16, 16, 32
    torch.manual_seed(111)
    ref = MultiSpatialFusion(in_channels=2 * c, out_channels=c).eval()
    randomize_batchnorms(ref, rng)

    l = 3
    x = rng.normal(size=(1, l, h, w, c)).astype(np.float32)
    # the reference's generate_*_selector call .cuda(); strip that on CPU
    import opencood.models.sicpfuse_modules.multiagent_sicp_fuse as mod

    orig_mean = mod.MultiSpatialFusion.generate_overlap_selector
    orig_non = mod.MultiSpatialFusion.generate_nonoverlap_selector
    mod.MultiSpatialFusion.generate_overlap_selector = (
        lambda self, sel: torch.mean(sel, 1).unsqueeze(0)
    )
    import numpy as _np

    mod.MultiSpatialFusion.generate_nonoverlap_selector = (
        lambda self, ov: torch.tensor(_np.where(ov.cpu() > 0, 0, 1))
    )
    try:
        with torch.no_grad():
            out_ref = ref(
                torch.tensor(x[0].transpose(0, 3, 1, 2)),
                torch.tensor([l]),
                torch.eye(4)[None, None, None, :2, [0, 1, 3]].repeat(
                    1, l, l, 1, 1
                ),
            ).numpy()[0]
    finally:
        mod.MultiSpatialFusion.generate_overlap_selector = orig_mean
        mod.MultiSpatialFusion.generate_nonoverlap_selector = orig_non

    model = SpatialFusion(in_channels=2 * c, out_channels=c)
    batch_args = (
        jnp.asarray(x),
        jnp.ones((1, l), bool),
        jnp.broadcast_to(jnp.eye(4), (1, l, l, 4, 4)),
    )
    kw = dict(discrete_ratio=0.4, downsample_rate=2, train=False)
    variables = model.init(jax.random.PRNGKey(0), *batch_args, **kw)
    ts = tc.TorchState(ref.state_dict())
    asg = tc.Assigner(variables)
    tc.convert_sicp_fusion(ts, asg, ())
    assert not asg.skipped, asg.skipped
    assert ts.leftovers() == [], ts.leftovers()

    out = model.apply(asg.variables, *batch_args, **kw)
    assert_close(
        np.asarray(out)[0].transpose(2, 0, 1), out_ref, atol=2e-3, rtol=2e-3,
        what="sicp fused",
    )


def test_heal_e2e_parity(rng):
    """Full Airv2xHEAL forward parity with converted weights: encoders ->
    single-stage ResNet modality backbone -> pyramid forward_collab
    (occupancy-weighted warp-fuse) -> shrink -> heads."""
    from opencood.models.airv2x_heal import Airv2xHEAL

    from airv2x_tpu.models import build_model

    hypes = _parity_hypes()
    hypes["model"]["core_method"] = "airv2x_heal"
    args = hypes["model"]["args"]
    del args["where2com_fusion"]
    # reference heal layout: single-stage 64ch modality backbone, the
    # pyramid carries the multiscale deblocks (airv2x_HEAL_collab_lidar.yaml)
    args["modality_fusion"] = {
        "base_bev_backbone": {
            "layer_nums": [1],
            "layer_strides": [2],
            "num_filters": [64],
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
    }
    args["fusion_backbone"] = {
        "resnext": True,
        "layer_nums": [1, 1],
        "layer_strides": [1, 2],
        "num_filters": [32, 64],
        "upsample_strides": [1, 2],
        "num_upsample_filter": [32, 32],
        "inplanes": 64,
        "anchor_number": 2,
        "align_corners": False,
    }
    args["in_head"] = 64

    torch.manual_seed(121)
    ref = Airv2xHEAL(dict(args)).eval()
    randomize_batchnorms(ref, rng)

    srng = np.random.default_rng(23)
    data_dict, batch = _build_e2e_inputs(hypes, srng)
    with torch.no_grad():
        out_ref = ref(data_dict)

    model = build_model(hypes)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)},
        batch,
        train=False,
    )
    asg = tc.convert_state_dict(ref.state_dict(), variables, hypes)
    assert not asg.skipped, asg.skipped
    assert asg.torch_leftovers == [], asg.torch_leftovers

    out = model.apply(asg.variables, batch, train=False)
    assert_close(
        nchw(out["psm"]), out_ref["psm"].numpy(), atol=2e-3, rtol=2e-3,
        what="heal e2e psm",
    )
    assert_close(
        nchw(out["rm"]), out_ref["rm"].numpy(), atol=2e-3, rtol=2e-3,
        what="heal e2e rm",
    )


def test_disconet_pixel_weight_parity():
    """PixelWeightLayer (point_pillar_disconet.py:176-199) conversion."""
    import torch
    import torch.nn as tnn

    from airv2x_tpu.models.point_pillar_models import PixelWeightLayer

    c2 = 32  # 2C for C=16

    class TorchPWL(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1_1 = tnn.Conv2d(c2, 128, 1)
            self.bn1_1 = tnn.BatchNorm2d(128)
            self.conv1_2 = tnn.Conv2d(128, 32, 1)
            self.bn1_2 = tnn.BatchNorm2d(32)
            self.conv1_3 = tnn.Conv2d(32, 8, 1)
            self.bn1_3 = tnn.BatchNorm2d(8)
            self.conv1_4 = tnn.Conv2d(8, 1, 1)

        def forward(self, x):
            import torch.nn.functional as F

            x = F.relu(self.bn1_1(self.conv1_1(x)))
            x = F.relu(self.bn1_2(self.conv1_2(x)))
            x = F.relu(self.bn1_3(self.conv1_3(x)))
            return F.relu(self.conv1_4(x))

    tm = TorchPWL().eval()
    # non-trivial running stats
    with torch.no_grad():
        for bn in (tm.bn1_1, tm.bn1_2, tm.bn1_3):
            bn.running_mean.normal_(0, 0.3)
            bn.running_var.uniform_(0.5, 2.0)

    x = np.random.default_rng(7).normal(size=(2, 12, 10, c2)).astype(np.float32)
    with torch.no_grad():
        want = (
            tm(torch.from_numpy(x).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1)
            .numpy()
        )

    model = PixelWeightLayer()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ts = tc.TorchState(
        {f"pixel_weight_layer.{k}": v for k, v in tm.state_dict().items()}
    )
    asg = tc.Assigner(jax.tree_util.tree_map(np.asarray, dict(variables)))
    pw = ts.sub("pixel_weight_layer")
    for i in range(1, 4):
        tc.convert_conv(pw, asg, (f"Conv_{i - 1}",), scope=f"conv1_{i}")
        tc.convert_bn(pw, asg, (f"BatchNorm_{i - 1}",), scope=f"bn1_{i}")
    tc.convert_conv(pw, asg, ("Conv_3",), scope="conv1_4")
    assert not ts.leftovers(), ts.leftovers()

    got = np.asarray(model.apply(asg.variables, jnp.asarray(x)))
    # four convs + three BNs of fp32 accumulate ~3e-4 torch-vs-XLA noise
    assert_close(got, want, atol=1e-3, rtol=1e-3,
                 what="disconet pixel weight layer")
