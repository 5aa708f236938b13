"""Camera-branch torch parity: faithful LSS trunks vs hand-built torch twins.

The reference camera encoders wrap efficientnet_pytorch / torchvision
(lss_submodule.py:50-349); those libraries are absent in this image, so
tests/torch_camera_twins.py replicates their block structures with the
exact module names a real checkpoint contains. These tests randomize the
twins (weights + BN running stats), convert their state_dict through
utils/torch_convert, and assert the flax forward matches torch eval-mode
forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from airv2x_tpu.models.camera import lss, trunks
from airv2x_tpu.utils import torch_convert as tc

from tests import torch_camera_twins as twins
from tests.test_torch_parity import (
    assert_close,
    nchw,
    nhwc,
    randomize_batchnorms,
)

pytestmark = pytest.mark.slow


def _convert(module_ts, variables, fn, *args):
    asg = tc.Assigner(variables)
    fn(module_ts, asg, *args)
    assert not asg.skipped, asg.skipped
    return asg


@pytest.fixture(scope="module")
def torch_seed():
    torch.manual_seed(0)


def test_up_block_parity(rng, torch_seed):
    ref = twins.UpTwin(24 + 16, 20, scale_factor=2).eval()
    randomize_batchnorms(ref, rng)
    x = rng.normal(0, 1, (2, 16, 8, 12)).astype(np.float32)
    skip = rng.normal(0, 1, (2, 24, 16, 24)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x), torch.tensor(skip))

    mod = trunks.UpBlock(20, scale=2)
    var = mod.init(jax.random.PRNGKey(0), jnp.asarray(nhwc(torch.tensor(x))),
                   jnp.asarray(nhwc(torch.tensor(skip))), False)
    asg = _convert(tc.TorchState(ref.state_dict()), var, tc.convert_up_block, ())
    got = mod.apply(asg.variables, jnp.asarray(nhwc(torch.tensor(x))),
                    jnp.asarray(nhwc(torch.tensor(skip))), False)
    assert_close(nchw(got), want.numpy(), what="UpBlock")


def test_efficientnet_camencode_parity(rng, torch_seed):
    """CamEncode (EfficientNet-b0 trunk, predicted depth) end to end."""
    d, c, ds = 6, 12, 8
    ref = twins.CamEncodeTwin(
        d, c, ds, (2, 50, 6), "LID", use_gt_depth=False, depth_supervision=True
    ).eval()
    randomize_batchnorms(ref, rng)
    img = rng.uniform(-1, 1, (2, 4, 64, 96)).astype(np.float32)
    img[:, 3] = rng.uniform(1, 60, (2, 64, 96))
    with torch.no_grad():
        (depth_logit, _), new_x = ref(torch.tensor(img))

    mod = lss.CamEncoder(depth_bins=d, context_c=c, downsample=ds,
                         encoder_type="EfficientNet", use_gt_depth=False)
    rgb = nhwc(torch.tensor(img[:, :3]))
    var = mod.init(jax.random.PRNGKey(0), jnp.asarray(rgb), None, False)
    asg = _convert(
        tc.TorchState(ref.state_dict()), var, tc.convert_cam_encoder, (),
        {"camera_encoder": "EfficientNet", "img_downsample": ds},
    )
    lifted, logits = mod.apply(asg.variables, jnp.asarray(rgb), None, False)
    # flax lifted: (B, fH, fW, D, C); torch new_x: (B, C, D, fH, fW)
    got = np.transpose(np.asarray(lifted), (0, 4, 3, 1, 2))
    assert_close(got, new_x.numpy(), what="effnet lifted")
    assert_close(nchw(logits), depth_logit.numpy(), what="depth logits")


def test_resnet101_camencode_parity(rng, torch_seed):
    d, c, ds = 6, 12, 8
    ref = twins.CamEncodeResnet101Twin(
        d, c, ds, (2, 50, 6), "LID", use_gt_depth=False, depth_supervision=True
    ).eval()
    randomize_batchnorms(ref, rng)
    img = rng.uniform(-1, 1, (2, 4, 64, 96)).astype(np.float32)
    img[:, 3] = rng.uniform(1, 60, (2, 64, 96))
    with torch.no_grad():
        (depth_logit, _), new_x = ref(torch.tensor(img))

    mod = lss.CamEncoder(depth_bins=d, context_c=c, downsample=ds,
                         encoder_type="Resnet101", use_gt_depth=False)
    rgb = nhwc(torch.tensor(img[:, :3]))
    var = mod.init(jax.random.PRNGKey(0), jnp.asarray(rgb), None, False)
    asg = _convert(
        tc.TorchState(ref.state_dict()), var, tc.convert_cam_encoder, (),
        {"camera_encoder": "Resnet101", "img_downsample": ds},
    )
    lifted, logits = mod.apply(asg.variables, jnp.asarray(rgb), None, False)
    got = np.transpose(np.asarray(lifted), (0, 4, 3, 1, 2))
    assert_close(got, new_x.numpy(), what="resnet101 lifted")
    assert_close(nchw(logits), depth_logit.numpy(), what="depth logits")


def test_bevencode_parity(rng, torch_seed):
    ref = twins.BevEncodeTwin(16, 10).eval()
    randomize_batchnorms(ref, rng)
    x = rng.normal(0, 1, (2, 16, 48, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x))
    mod = lss.BevEncoder(10)
    var = mod.init(jax.random.PRNGKey(0), jnp.asarray(nhwc(torch.tensor(x))),
                   False)
    asg = _convert(tc.TorchState(ref.state_dict()), var, tc.convert_bevencode,
                   ())
    got = mod.apply(asg.variables, jnp.asarray(nhwc(torch.tensor(x))), False)
    assert_close(nchw(got), want.numpy(), what="BevEncode")


@pytest.fixture(scope="module")
def lss_cfg():
    return {
        "grid_conf": {
            "xbound": [-19.2, 19.2, 0.4],
            "ybound": [-19.2, 19.2, 0.4],
            "zbound": [-10, 10, 20.0],
            "ddiscr": [2, 50, 6],
            "mode": "LID",
        },
        "data_aug_conf": {"final_dim": [64, 96]},
        "img_downsample": 8,
        "img_features": 12,
        "bevout_feature": 16,
        "camera_encoder": "EfficientNet",
        "use_depth_gt": True,
        "depth_supervision": False,
    }


def _cam_inputs(rng, b=1, n=2, hw=(64, 96)):
    h, w = hw
    imgs = rng.uniform(0, 1, (b, n, 4, h, w)).astype(np.float32)
    imgs[:, :, 3] = rng.uniform(1, 60, (b, n, h, w))
    intr = np.zeros((b, n, 3, 3), np.float32)
    intr[..., 0, 0] = intr[..., 1, 1] = 80.0
    intr[..., 0, 2], intr[..., 1, 2] = w / 2, h / 2
    intr[..., 2, 2] = 1.0
    rots = np.zeros((b, n, 3, 3), np.float32)
    rots[..., 0, 2] = 1.0
    rots[..., 1, 0] = -1.0
    rots[..., 2, 1] = -1.0
    trans = rng.uniform(-1, 1, (b, n, 3)).astype(np.float32)
    post_rots = np.broadcast_to(np.eye(3, dtype=np.float32), (b, n, 3, 3)).copy()
    post_trans = np.zeros((b, n, 3), np.float32)
    return {
        "imgs": imgs, "intrinsics": intr, "rots": rots, "trans": trans,
        "post_rots": post_rots, "post_trans": post_trans,
    }


def test_full_lss_encoder_parity(rng, torch_seed, lss_cfg):
    """Whole camera branch with converted weights: frustum geometry +
    gt-depth binning + lift + voxel pooling + BevEncode, eval mode."""
    ref = twins.LiftSplatShootEncoderTwin(lss_cfg).eval()
    randomize_batchnorms(ref, rng)
    inputs = _cam_inputs(rng)
    with torch.no_grad():
        want = ref({k: torch.tensor(v) for k, v in inputs.items()})

    mod = lss.LSSCameraEncoder(cfg=lss_cfg)
    jx = {
        k: jnp.asarray(
            np.moveaxis(v, 2, -1) if k == "imgs" else v
        )
        for k, v in inputs.items()
    }
    var = mod.init(jax.random.PRNGKey(0), jx, False)
    asg = _convert(tc.TorchState(ref.state_dict()), var, tc.convert_lss_encoder,
                   (), lss_cfg)
    got = mod.apply(asg.variables, jx, False)
    assert_close(nchw(got), want.numpy(), atol=5e-4, rtol=5e-4,
                 what="LSS encoder e2e")


def test_hetero_camera_e2e_parity(rng, torch_seed):
    """Camera+LiDAR heterogeneous where2comm: the reference's ACTUAL
    Airv2xWhere2com with LSS camera branches (vehicle lidar+cam, rsu/drone
    cam-only) vs the flax twin with a converted checkpoint. Exercises the
    real airv2x_encoder.py / lss_submodule.py code via the functional
    camera backends (tests/reference_stubs.install_camera_backends)."""
    import copy

    from tests.reference_stubs import (
        install_camera_backends,
        patched_cuda_to_cpu,
    )

    install_camera_backends()

    from tests.test_torch_parity import _build_e2e_inputs, _parity_hypes

    cam_cfg = {
        "grid_conf": {
            "xbound": [-6.4, 6.4, 0.4],
            "ybound": [-6.4, 6.4, 0.4],
            "zbound": [-10, 10, 20.0],
            "ddiscr": [2, 50, 6],
            "mode": "LID",
        },
        "data_aug_conf": {"final_dim": [64, 96]},
        "img_downsample": 8,
        "img_features": 12,
        "bevout_feature": 64,
        "camera_encoder": "EfficientNet",
        "use_depth_gt": True,
        "depth_supervision": False,
    }
    hypes = copy.deepcopy(_parity_hypes())
    args = hypes["model"]["args"]
    args["vehicle"]["modalities"] = ["lidar", "cam"]
    args["rsu"]["modalities"] = ["cam"]
    args["drone"]["modalities"] = ["cam"]
    for t in ("vehicle", "rsu", "drone"):
        args[t]["cam"] = copy.deepcopy(cam_cfg)
    args["active_sensors"] = ["lidar", "cam"]

    data_dict, batch = _build_e2e_inputs(hypes, rng)

    def cam_block(n_agents, ncam=1, hw=(64, 96)):
        ins = _cam_inputs(rng, b=n_agents, n=ncam, hw=hw)
        return {k: torch.tensor(v) for k, v in ins.items()}

    # repo batch contract: cam_{t} arrays span ALL slots (vehicle 0:2,
    # rsu 2:3, drone 3:4); the model slices each type's range itself.
    slot_ranges = {"vehicle": (0, 2), "rsu": (2, 3), "drone": (3, 4)}
    total_slots = 4
    for t, (lo, hi) in slot_ranges.items():
        data_dict[t]["batch_merged_cam_inputs"] = cam_block(hi - lo)
        tt = data_dict[t]["batch_merged_cam_inputs"]
        full = {}
        for k in tt:
            v = tt[k].numpy()
            if k == "imgs":
                v = np.moveaxis(v, 2, -1)
            slot_v = np.zeros((total_slots,) + v.shape[1:], v.dtype)
            slot_v[lo:hi] = v
            full[k] = jnp.asarray(slot_v)[None]
        batch[f"cam_{t}"] = full

    from opencood.models.airv2x_where2com import Airv2xWhere2com

    from airv2x_tpu.models import build_model

    torch.manual_seed(5)
    targs = dict(args)
    targs["where2com_fusion"] = dict(args["where2com_fusion"])
    with patched_cuda_to_cpu():
        ref = Airv2xWhere2com(targs).eval()
        randomize_batchnorms(ref, rng)
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
    for key, ref_key in (("psm", "psm"), ("rm", "rm"), ("obj", "obj")):
        assert_close(
            nchw(out[key]), out_ref[ref_key].numpy(), atol=2e-3, rtol=2e-3,
            what=f"hetero-cam e2e {key}",
        )


def test_gt_depth_binning_parity(rng, lss_cfg):
    """bin_depth_indices vs the reference bin_depths in both target modes."""
    depth = rng.uniform(-5, 80, (3, 32, 40)).astype(np.float32)
    depth[0, 0, 0] = np.inf
    for mode in ("UD", "LID"):
        for target in (True, False):
            t_idx, t_mask = twins.bin_depths_twin(
                torch.tensor(np.minimum(depth, 50.0)), mode, 2, 50, 6,
                target=target,
            )
            j_idx, j_mask = lss.bin_depth_indices(
                jnp.minimum(jnp.asarray(depth), 50.0), mode, 2, 50, 6,
                target=target,
            )
            np.testing.assert_array_equal(np.asarray(j_idx), t_idx.numpy())
            if not target:
                np.testing.assert_array_equal(
                    np.asarray(j_mask), t_mask.numpy()
                )
