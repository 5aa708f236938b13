import jax
import jax.numpy as jnp
import numpy as np

from airv2x_tpu.models import build_model
from tests.test_point_pillar_family import _batch, _hypes


def _rtnh_hypes():
    hypes = _hypes(
        "RTNH_intermediate",
        {
            "anchor_num": 2,
            "BACKBONE": {
                "ENCODING": {"CHANNEL": [8, 16], "STRIDE": [2, 2],
                             "PADDING": [1, 1]},
                "TO_BEV": {"IS_Z_EMBED": False, "CHANNEL": [16, 16],
                           "KERNEL_SIZE": [3, 6], "STRIDE": [1, 2],
                           "PADDING": [1, 2]},
            },
            "PRE_PROCESSOR": {"OUT_DIM": 24},
        },
    )
    # shallow z grid (8 cells) like the reference's 10-cell radar cube
    hypes["preprocess"]["args"]["voxel_size"] = [0.4, 0.4, 0.5]
    return hypes


def test_rtnh_forward():
    hypes = _rtnh_hypes()
    model = build_model(hypes)
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    radar = rng.uniform(-12, 12, (1, 3, 256, 4)).astype(np.float32)
    radar[..., 2] = rng.uniform(-2, 0, (1, 3, 256))
    batch["radar_points"] = jnp.asarray(radar)
    batch["radar_points_mask"] = jnp.ones((1, 3, 256), bool)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)}, batch
    )
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    # BEV levels all deconv back to (ny/2, nx/2) = (32, 32)
    assert out["psm"].shape == (1, 32, 32, 2)
    assert out["rm"].shape == (1, 32, 32, 14)
    assert np.isfinite(np.asarray(out["psm"])).all()
    assert np.isfinite(np.asarray(out["rm"])).all()


def test_l4dr_forward():
    hypes = _hypes("point_pillar_l4dr", {})
    model = build_model(hypes)
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    radar = rng.uniform(-12, 12, (1, 3, 256, 4)).astype(np.float32)
    radar[..., 2] = rng.uniform(-2, 0, (1, 3, 256))
    batch["radar_points"] = jnp.asarray(radar)
    batch["radar_points_mask"] = jnp.ones((1, 3, 256), bool)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)}, batch
    )
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert out["psm"].shape == (1, 32, 32, 2)
    assert np.isfinite(np.asarray(out["psm"])).all()


def test_mdd_forward_train_and_eval():
    from tests.test_point_pillar_family import _batch, _hypes

    hypes = _hypes(
        "point_pillar_mdd",
        {"mdd_block": {
            "model": {
                "in_channels": 16, "out_ch": 16, "ch": 8, "ch_mult": [1, 1],
                "num_res_blocks": 1, "attn_resolutions": [16],
                "dropout": 0.0, "resamp_with_conv": True,
            },
            "diffusion": {"num_diffusion_timesteps": 2},
        }},
    )
    model = build_model(hypes)
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    radar = rng.uniform(-12, 12, (1, 3, 256, 4)).astype(np.float32)
    radar[..., 2] = rng.uniform(-2, 0, (1, 3, 256))
    batch["radar_points"] = jnp.asarray(radar)
    batch["radar_points_mask"] = jnp.ones((1, 3, 256), bool)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {
            "params": jax.random.PRNGKey(0),
            "comm": jax.random.PRNGKey(1),
            "diffusion": jax.random.PRNGKey(2),
        },
        batch,
    )
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert out["psm"].shape == (1, 32, 32, 2)
    assert np.isfinite(np.asarray(out["psm"])).all()
    # train mode exposes the denoised / clean feature pair for the
    # point_pillar_loss_mdd feature-MSE term
    out_t, _ = model.apply(
        variables, batch, train=True,
        rngs={"comm": jax.random.PRNGKey(3), "diffusion": jax.random.PRNGKey(4)},
        mutable=["batch_stats"],
    )
    assert out_t["pred_feature"].shape == out_t["gt_feature"].shape
    assert np.isfinite(np.asarray(out_t["pred_feature"])).all()


def test_interf_forward():
    from tests.test_point_pillar_family import _batch, _hypes

    hypes = _hypes("point_pillar_interf", {})
    model = build_model(hypes)
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    radar = rng.uniform(-12, 12, (1, 3, 256, 4)).astype(np.float32)
    radar[..., 2] = rng.uniform(-2, 0, (1, 3, 256))
    batch["radar_points"] = jnp.asarray(radar)
    batch["radar_points_mask"] = jnp.ones((1, 3, 256), bool)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)}, batch
    )
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert out["psm"].shape == (1, 32, 32, 2)
    assert np.isfinite(np.asarray(out["psm"])).all()


def test_interral_semantics():
    """Faithful interRAL: cross-PILLAR attention per point slot. Padded
    pillar rows on either side must not influence the real rows' outputs
    (masked attention + masked BN stats)."""
    import jax
    import jax.numpy as jnp

    from airv2x_tpu.models.radar_models import InterRAL

    rng = np.random.default_rng(7)
    B, N, M, K, F = 1, 5, 4, 6, 10
    x = rng.normal(size=(B, N, K, F)).astype(np.float32)
    y = rng.normal(size=(B, M, K, F)).astype(np.float32)
    xm = np.ones((B, N), bool)
    xm[:, -1] = False  # padded lidar row
    ym = np.ones((B, M), bool)
    ym[:, -1] = False  # padded radar row

    mod = InterRAL(channels=16)
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(y),
                 jnp.asarray(xm), jnp.asarray(ym), False)
    out = mod.apply(v, jnp.asarray(x), jnp.asarray(y), jnp.asarray(xm),
                    jnp.asarray(ym), False)
    assert out.shape == (B, N, 16)
    assert np.isfinite(np.asarray(out)).all()

    # garbage in the padded rows leaves real-row outputs unchanged
    x2, y2 = x.copy(), y.copy()
    x2[:, -1] += 100.0
    y2[:, -1] -= 50.0
    out2 = mod.apply(v, jnp.asarray(x2), jnp.asarray(y2), jnp.asarray(xm),
                     jnp.asarray(ym), False)
    np.testing.assert_allclose(
        np.asarray(out[:, :-1]), np.asarray(out2[:, :-1]), atol=1e-5
    )
    # perturbing a REAL radar row changes every real lidar row's output
    y3 = y.copy()
    y3[:, 0] += 1.0
    out3 = mod.apply(v, jnp.asarray(x), jnp.asarray(y3), jnp.asarray(xm),
                     jnp.asarray(ym), False)
    assert not np.allclose(np.asarray(out[:, 0]), np.asarray(out3[:, 0]),
                           atol=1e-4)
