"""Gradient accumulation (make_train_step accum_steps) equivalence.

accum_steps=k must equal: run the k microbatches sequentially (BN batch
statistics threaded through, like k consecutive steps of the reference's
small-batch recipe), average the k gradients, apply ONE optimizer update.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from airv2x_tpu.parallel.train import TrainState, create_train_state, make_train_step


class TinyNet(nn.Module):
    @nn.compact
    def __call__(self, batch, train: bool = False):
        x = batch["points"]
        x = nn.Dense(8)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        return {"y": nn.Dense(2)(x)}


def _loss(out, labels):
    total = jnp.mean((out["y"] - labels["y"]) ** 2)
    return total, {"total_loss": total}


def _setup(b, tx=None):
    rng = np.random.default_rng(0)
    batch = {
        "points": jnp.asarray(rng.normal(size=(b, 5)), jnp.float32),
        "labels": {
            "y": jnp.asarray(rng.normal(size=(b, 2)), jnp.float32),
            "epoch": jnp.float32(1.0),  # scalar rides along unscanned
        },
    }
    model = TinyNet()
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    tx = tx or optax.adam(1e-2)
    return model, tx, create_train_state(model, variables, tx), batch


def test_accum_matches_manual_microbatching():
    # sgd(1.0) makes the update the gradient itself: exact equivalence,
    # no adam normalization blowing up the degenerate ~1e-7 bias gradient
    # (Dense bias before BN has zero gradient by construction)
    k, b = 2, 4
    model, tx, state, batch = _setup(b, tx=optax.sgd(1.0))

    step = make_train_step(model, _loss, tx, donate=False, accum_steps=k)
    rng = jax.random.PRNGKey(7)
    new_state, parts = step(state, batch, rng)

    # manual twin
    def forward(params, stats, mb, r):
        out, upd = model.apply(
            {"params": params, "batch_stats": stats}, mb, train=True,
            rngs={"comm": r, "diffusion": jax.random.fold_in(r, 1),
                  "dropout": jax.random.fold_in(r, 2)},
            mutable=["batch_stats"],
        )
        total, p = _loss(out, mb["labels"])
        return total, (p, upd["batch_stats"])

    base = jax.random.fold_in(rng, state.step)
    stats = state.batch_stats
    grads_sum = jax.tree.map(lambda p: jnp.zeros_like(p), state.params)
    mb_sz = b // k
    for i in range(k):
        mb = {
            "points": batch["points"][i * mb_sz:(i + 1) * mb_sz],
            "labels": {
                "y": batch["labels"]["y"][i * mb_sz:(i + 1) * mb_sz],
                "epoch": batch["labels"]["epoch"],
            },
        }
        (_, (_, stats)), g = jax.value_and_grad(forward, has_aux=True)(
            state.params, stats, mb, jax.random.fold_in(base, 3 * i)
        )
        grads_sum = jax.tree.map(jnp.add, grads_sum, g)
    grads = jax.tree.map(lambda g: g / k, grads_sum)
    upd, _ = tx.update(grads, state.opt_state, state.params)
    want_params = optax.apply_updates(state.params, upd)

    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-5, atol=2e-6
        ),
        new_state.params, want_params,
    )
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-5, atol=2e-6
        ),
        new_state.batch_stats, stats,
    )
    assert float(parts["total_loss"]) > 0


def test_accum_1_unchanged():
    """accum_steps=1 is the plain path (no scan) — same result as before."""
    model, tx, state, batch = _setup(4)
    s1 = make_train_step(model, _loss, tx, donate=False, accum_steps=1)
    ns, parts = s1(state, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(parts["total_loss"]))
    assert int(ns.step) == 1
