import jax
import jax.numpy as jnp
import numpy as np

from airv2x_tpu.models import build_model
from tests.test_point_pillar_family import _hypes


def test_scope_temporal_forward():
    hypes = _hypes(
        "point_pillar_scope",
        {
            "temporal_fusion": {
                "channels": 32,
                "method": "lstm",
                "discrete_ratio": 0.4,
                "downsample_rate": 2,
            }
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
