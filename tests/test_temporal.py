import jax
import jax.numpy as jnp
import numpy as np

from airv2x_tpu.models import build_model
from tests.test_point_pillar_family import _hypes


def test_scope_temporal_forward():
    hypes = _hypes(
        "point_pillar_scope",
        {
            "fusion_args": {
                "voxel_size": [0.4, 0.4, 4],
                "downsample_rate": 1,
                "communication": {
                    "thre": 0.01,
                    "gaussian_smooth": {"k_size": 5, "c_sigma": 1.0},
                },
                "agg_operator": {"mode": "Deform"},
                "multi_scale": True,
                "frame": 2,
                "num_queries": 64,
                "layer_nums": [1, 1],
                "num_filters": [16, 32],
                "temporal_fusion": {
                    "channel": 32,
                    "height": 32,
                    "width": 32,
                },
            },
        },
    )
    model = build_model(hypes)
    rng = np.random.default_rng(0)
    b, t, l, n = 1, 3, 3, 256
    pts = rng.uniform(-12, 12, (b, t, l, n, 4)).astype(np.float32)
    pts[..., 2] = rng.uniform(-2, 0, (b, t, l, n))
    batch = {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((b, t, l, n), bool),
        "agent_mask": jnp.ones((b, t, l), bool),
        "history_t": jnp.broadcast_to(jnp.eye(4), (b, t, 4, 4)),
        "pairwise_t_full": jnp.broadcast_to(jnp.eye(4), (b, t, l, l, 4, 4)),
    }
    variables = jax.jit(lambda r, bb: model.init(r, bb, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)}, batch
    )
    out = jax.jit(lambda v, bb: model.apply(v, bb, train=False))(variables, batch)
    assert out["psm"].shape == (1, 32, 32, 2)
    assert np.isfinite(np.asarray(out["psm"])).all()


def test_how2comm_stcformer_forward():
    """Faithful How2comm: flow compensation + mutual communication +
    STCFormer (decoupling, temporal attention, deformable refinement)."""
    hypes = _hypes(
        "point_pillar_how2comm",
        {
            "flow_flag": True,
            "fusion_args": {
                "voxel_size": [0.4, 0.4, 4],
                "downsample_rate": 1,
                "communication": {
                    "thre": 0.01,
                    "request_flag": True,
                    "gaussian_smooth": {"k_size": 5, "c_sigma": 1.0},
                },
                "communication_flag": True,
                "multi_scale": True,
                "num_queries": 64,
                "layer_nums": [1, 1],
                "num_filters": [16, 32],
            },
        },
    )
    model = build_model(hypes)
    rng = np.random.default_rng(1)
    b, t, l, n = 1, 2, 3, 256
    pts = rng.uniform(-12, 12, (b, t, l, n, 4)).astype(np.float32)
    pts[..., 2] = rng.uniform(-2, 0, (b, t, l, n))
    batch = {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((b, t, l, n), bool),
        "agent_mask": jnp.ones((b, t, l), bool),
        "history_t": jnp.broadcast_to(jnp.eye(4), (b, t, 4, 4)),
        "pairwise_t_full": jnp.broadcast_to(jnp.eye(4), (b, t, l, l, 4, 4)),
    }
    variables = jax.jit(lambda r, bb: model.init(r, bb, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)}, batch
    )
    out = jax.jit(lambda v, bb: model.apply(v, bb, train=False))(variables, batch)
    assert out["psm"].shape == (1, 32, 32, 2)
    assert np.isfinite(np.asarray(out["psm"])).all()


def test_stc_decoupling_semantics():
    """Exclusive map suppresses where ego is confident; common map keeps it."""
    from airv2x_tpu.models.fusion.stcformer import Decoupling

    conf = jnp.stack([
        jnp.full((4, 4, 1), 0.9),   # ego confident everywhere
        jnp.full((4, 4, 1), 0.8),   # neighbour confident
    ])[None]
    feat = jnp.ones((1, 2, 4, 4, 8))
    exc, com, exc_map, com_map = Decoupling()(feat, conf)
    # exclusive: (1-0.9)*0.8 = 0.08 > 0.01 -> kept; common 0.72 -> kept
    assert float(exc_map[0, 1].max()) < float(com_map[0, 1].max())
    # with ego fully confident (1.0) the neighbour's exclusive part vanishes
    conf2 = conf.at[:, 0].set(1.0)
    exc2, _, _, _ = Decoupling()(feat, conf2)
    assert float(jnp.abs(exc2[0, 1]).max()) == 0.0
