"""Torch parity for the faithful MDD diffusion denoiser.

Runs the reference's ACTUAL Cond_Diff_Denoise / DiffusionUNet torch code
(mdd_modules/radar_cond_diff_denoise.py, unet.py) against the flax twins
with converted weights — both the standalone denoising chain and the full
point_pillar_intermediate_lrf_MDD model. The chain's gaussian draws are
injected on both sides (rcdd.default / rcdd.noise_like monkeypatch vs the
flax ``noises`` argument) so the stochastic reverse process is compared
deterministically.
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
from airv2x_tpu.utils import torch_convert as tc  # noqa: E402
from tests.test_torch_parity import randomize_batchnorms  # noqa: E402

pytestmark = pytest.mark.slow

C = 64
T = 3


def _mdd_block(attn_resolutions):
    return {
        "model": {
            "in_channels": C,
            "out_ch": C,
            "ch": 8,
            "ch_mult": [1, 1],
            "num_res_blocks": 2,
            # the reference hardcodes resolution=128 (unet.py:198): level-0
            # blocks see curr_res=128, level-1 blocks 64 — [64] exercises
            # the AttnBlock path regardless of the actual input size
            "attn_resolutions": list(attn_resolutions),
            "dropout": 0.0,
            "resamp_with_conv": True,
        },
        "diffusion": {
            "beta_schedule": "linear",
            "beta_start": 0.0005,
            "beta_end": 0.02,
            "num_diffusion_timesteps": T,
        },
    }


def _randomize_groupnorms(module, rng):
    for m in module.modules():
        if isinstance(m, torch.nn.GroupNorm):
            with torch.no_grad():
                m.weight.copy_(torch.tensor(
                    rng.uniform(0.5, 1.5, m.weight.shape), dtype=torch.float32
                ))
                m.bias.copy_(torch.tensor(
                    rng.uniform(-0.2, 0.2, m.bias.shape), dtype=torch.float32
                ))


def _patch_noise(monkeypatch, rcdd, init_noise_t, step_noises_t):
    """Route the chain's gaussian draws: ``default(None, randn_like)`` is
    the q_sample init (:466/:485), ``noise_like`` fires once per p_sample
    call (T calls; the t=0 draw is computed but unused, :410-420)."""
    seq = list(step_noises_t)

    monkeypatch.setattr(rcdd, "default", lambda val, d: init_noise_t)
    monkeypatch.setattr(
        rcdd, "noise_like",
        lambda shape, device, repeat=False: seq.pop(0),
    )


@pytest.mark.parametrize("attn_resolutions", [(16,), (64,)])
def test_cond_diff_denoise_chain_parity(monkeypatch, attn_resolutions):
    from opencood.models.mdd_modules import radar_cond_diff_denoise as rcdd

    cfg = _mdd_block(attn_resolutions)
    rng = np.random.default_rng(5)
    B, H, W = 2, 16, 16

    torch.manual_seed(11)
    ref = rcdd.Cond_Diff_Denoise(cfg, 32).eval()
    _randomize_groupnorms(ref, rng)

    lidar = rng.normal(size=(B, H, W, C)).astype(np.float32)
    radar = rng.normal(size=(B, H, W, C)).astype(np.float32)
    noises = rng.normal(size=(T, B, H, W, C)).astype(np.float32)

    def nchw(a):
        return torch.tensor(np.moveaxis(a, -1, 1))

    # torch noise_like call order: t = T-1 .. 0 -> noises[1], noises[2],
    # then one unused draw for the t=0 step
    _patch_noise(
        monkeypatch, rcdd, nchw(noises[0]),
        [nchw(noises[1]), nchw(noises[2]), nchw(noises[2] * 0)],
    )
    with torch.no_grad():
        out_ref = ref({
            "spatial_features": nchw(lidar),
            "ra_spatial_features": nchw(radar),
        })["pred_feature"]

    from airv2x_tpu.models.fusion.mdd import CondDiffDenoise

    model = CondDiffDenoise(model_cfg=cfg["model"], num_timesteps=T)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(lidar), jnp.asarray(radar),
        noises=jnp.asarray(noises),
    )
    ts = tc.TorchState(dict(ref.state_dict()))
    asg = tc.Assigner(jax.tree.map(np.asarray, dict(variables)))
    tc.convert_diffusion_unet(
        ts.sub("denoiser"), asg, ("denoiser",), cfg["model"]
    )
    assert not asg.skipped, asg.skipped[:8]
    got = np.asarray(model.apply(
        asg.variables, jnp.asarray(lidar), jnp.asarray(radar),
        noises=jnp.asarray(noises),
    ))
    want = np.moveaxis(out_ref.numpy(), 1, -1)
    assert got.shape == want.shape
    err = np.abs(got - want).max()
    scale = max(np.abs(want).max(), 1.0)
    assert err < 2e-3 * scale, f"chain mismatch {err} (scale {scale})"


def test_lrf_mdd_e2e_parity(monkeypatch):
    """Full point_pillar_intermediate_lrf_MDD: pillars -> diffusion denoise
    -> occupancy mask -> [lidar, radar] concat -> AttBEVBackbone per-stage
    fusion -> heads, reference torch vs converted flax."""
    from opencood.models.mdd_modules import radar_cond_diff_denoise as rcdd
    from opencood.models.point_pillar_intermediate_lrf_MDD import (
        PointPillarIntermediateLRFMDD,
    )

    from airv2x_tpu.ops.voxelize import pillarize
    from tests.test_flat_e2e_parity import (
        GRID,
        L,
        N_PTS,
        _args,
        _hypes_for,
        _shared_inputs,
    )

    args = _args()
    args["mdd_block"] = _mdd_block((16,))
    rng = np.random.default_rng(23)
    data_dict, batch = _shared_inputs(args, rng)
    data_dict["train"] = False

    lr = args["lidar_range"]
    rpts = np.zeros((L, N_PTS // 2, 4), np.float32)
    for a in range(L):
        rpts[a, :, 0] = rng.uniform(lr[0], lr[3], N_PTS // 2)
        rpts[a, :, 1] = rng.uniform(lr[1], lr[4], N_PTS // 2)
        rpts[a, :, 2] = rng.uniform(-2.5, 0.5, N_PTS // 2)
        rpts[a, :, 3] = rng.uniform(0, 1, N_PTS // 2)
    rmask = np.ones((L, N_PTS // 2), bool)
    vf, npts, co = [], [], []
    for a in range(L):
        vox = pillarize(
            jnp.asarray(rpts[a]), jnp.asarray(rmask[a]),
            lidar_range=jnp.asarray(lr, jnp.float32),
            voxel_size=jnp.asarray(args["voxel_size"], jnp.float32),
            grid_size=(GRID, GRID, 1), max_pillars=512,
            max_points_per_pillar=8,
        )
        m = np.asarray(vox.mask)
        vf.append(np.asarray(vox.voxels)[m])
        npts.append(np.asarray(vox.num_points)[m])
        c = np.asarray(vox.coords)[m]
        co.append(np.concatenate([np.full((len(c), 1), a, c.dtype), c], 1))
    data_dict["processed_radar"] = {
        "voxel_features": torch.tensor(np.concatenate(vf)),
        "voxel_num_points": torch.tensor(np.concatenate(npts)),
        "voxel_coords": torch.tensor(np.concatenate(co)),
    }
    batch["radar_points"] = jnp.asarray(rpts[None])
    batch["radar_points_mask"] = jnp.asarray(rmask[None])

    noises = rng.normal(size=(T, L, GRID, GRID, C)).astype(np.float32)
    batch["mdd_noises"] = jnp.asarray(noises)

    def nchw(a):
        return torch.tensor(np.moveaxis(a, -1, 1))

    _patch_noise(
        monkeypatch, rcdd, nchw(noises[0]),
        [nchw(noises[1]), nchw(noises[2]), nchw(noises[2] * 0)],
    )

    torch.manual_seed(31)
    ref = PointPillarIntermediateLRFMDD(args).eval()
    randomize_batchnorms(ref, rng)
    _randomize_groupnorms(ref, rng)
    with torch.no_grad():
        out_ref = ref(data_dict)

    hypes = _hypes_for("point_pillar_intermediate_lrf_MDD", args)
    model = build_model(hypes)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False)
    asg = tc.CONVERTERS["point_pillar_intermediate_lrf_MDD"](
        {k: v for k, v in ref.state_dict().items()},
        jax.tree.map(np.asarray, dict(variables)), hypes,
    )
    assert not asg.skipped, asg.skipped[:8]
    assert not asg.torch_leftovers, asg.torch_leftovers[:8]
    out = model.apply(asg.variables, batch, train=False)
    for k in ("psm", "rm"):
        want = out_ref[k].permute(0, 2, 3, 1).numpy()
        got = np.asarray(out[k])
        assert got.shape == want.shape, (k, got.shape, want.shape)
        err = np.abs(got - want).max()
        scale = max(np.abs(want).max(), 1.0)
        assert err < 3e-3 * scale, f"lrf_mdd {k} e2e mismatch {err}"
    # the denoised (masked) feature output too
    want = out_ref["pred_feature"].permute(0, 2, 3, 1).numpy()
    got = np.asarray(out["pred_feature"])
    err = np.abs(got - want).max()
    assert err < 3e-3 * max(np.abs(want).max(), 1.0), f"pred_feature {err}"
