"""Smoke tests for the late-added flat-family models: flat SiCP (dual-loss
heads), the multiscale fusion baseline (resnet + plain backbones), the
DiscoNet KD teacher, and the V2X-R lidar+radar concat (_lrf) variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airv2x_tpu.models import build_model
from tests.test_point_pillar_family import _batch, _hypes


def _radar_batch(rng, l=3, n=512):
    batch = dict(_batch(rng, l=l, n=n))
    rpts = rng.uniform(-12, 12, (1, l, 256, 4)).astype(np.float32)
    rpts[..., 2] = rng.uniform(-2, 0, (1, l, 256))
    batch["radar_points"] = jnp.asarray(rpts)
    batch["radar_points_mask"] = jnp.ones((1, l, 256), bool)
    return batch


def _init_and_apply(hypes, batch, train=False):
    model = build_model(hypes)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)}, batch
    )
    if train:
        out, _ = model.apply(
            variables, batch, train=True,
            rngs={"comm": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
        )
        return out
    return jax.jit(lambda v, b: model.apply(v, b, train=False))(
        variables, batch
    )


SICP_EXTRA = {
    "fusion": {
        "in_channels": 32,
        "out_channels": 32,
        "voxel_size": [0.4, 0.4, 4],
        "downsample_rate": 2,
    }
}


def test_flat_sicp_dual_heads():
    hypes = _hypes("point_pillar_sicp", SICP_EXTRA)
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    out = _init_and_apply(hypes, batch, train=True)
    # dual-loss branch: solo ego + cooperative through the shared heads
    for k in ("psm", "rm", "psm1", "rm1", "psm2", "rm2"):
        assert k in out, k
    assert out["psm1"].shape == out["psm2"].shape == (1, 32, 32, 2)
    eval_out = _init_and_apply(hypes, batch, train=False)
    assert "psm1" not in eval_out
    assert np.isfinite(np.asarray(eval_out["psm"])).all()


@pytest.mark.parametrize("resnet", [False, True])
@pytest.mark.parametrize("method", ["max", "att"])
def test_baseline_multiscale(resnet, method):
    extra = {"fusion_method": method, "compression": 4}
    hypes = _hypes("point_pillar_baseline_multiscale", extra)
    hypes["model"]["args"]["base_bev_backbone"]["resnet"] = resnet
    rng = np.random.default_rng(1)
    out = _init_and_apply(hypes, _batch(rng))
    assert out["psm"].shape == (1, 32, 32, 2)
    assert out["rm"].shape == (1, 32, 32, 14)
    assert float(out["comm_rate"]) > 0
    assert np.isfinite(np.asarray(out["psm"])).all()


def test_disconet_teacher_outputs():
    hypes = _hypes("point_pillar_disconet_teacher")
    rng = np.random.default_rng(2)
    out = _init_and_apply(hypes, _batch(rng))
    assert {"teacher_feature", "teacher_psm", "teacher_rm"} <= set(out)
    assert out["teacher_feature"].shape == (1, 32, 32, 32)  # post-shrink
    assert out["teacher_psm"].shape == (1, 32, 32, 2)


def test_disconet_student_feature_exposed():
    hypes = _hypes("point_pillar_disconet")
    rng = np.random.default_rng(3)
    out = _init_and_apply(hypes, _batch(rng))
    # KD imitation target surface (matches teacher_feature width)
    assert out["student_feature"].shape == (1, 32, 32, 32)


LRF_CASES = {
    "point_pillar_where2comm_lrf": {
        "where2comm_fusion": {
            "fully": False,
            "communication": {"threshold": 0.01},
        }
    },
    "point_pillar_sicp_lrf": SICP_EXTRA,
    "point_pillar_coalign_lrf": {},
}


@pytest.mark.parametrize("name", sorted(LRF_CASES))
def test_lrf_variants(name):
    hypes = _hypes(name, LRF_CASES[name])
    rng = np.random.default_rng(4)
    batch = _radar_batch(rng)
    out = _init_and_apply(hypes, batch)
    assert out["psm"].shape == (1, 32, 32, 2)
    assert np.isfinite(np.asarray(out["psm"])).all()


def test_lrf_radar_contributes():
    """Zeroing the radar cloud must change the output (the radar branch is
    really concatenated, not dropped)."""
    hypes = _hypes("point_pillar_coalign_lrf")
    model = build_model(hypes)
    rng = np.random.default_rng(5)
    batch = _radar_batch(rng)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)}, batch
    )
    fwd = jax.jit(lambda v, b: model.apply(v, b, train=False))
    a = np.asarray(fwd(variables, batch)["psm"])
    b2 = dict(batch)
    b2["radar_points_mask"] = jnp.zeros_like(batch["radar_points_mask"])
    b = np.asarray(fwd(variables, b2)["psm"])
    assert np.abs(a - b).max() > 1e-6
