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


def test_accum_matches_microbatching_on_hetero_where2comm():
    """accum=2 == two sequential B=1 microbatches' averaged gradient on the
    REAL tiny where2comm hetero model — the graph whose B>=4 scheduling
    artifact motivated the feature, including MaskedBatchNorm statistic
    threading (VERDICT r4 item 7; TinyNet alone doesn't exercise the hetero
    encoder or masked BN)."""
    import os

    from airv2x_tpu.config import load_yaml
    from airv2x_tpu.data.synthetic import make_batch
    from airv2x_tpu.loss import build_loss
    from airv2x_tpu.models import build_model
    from airv2x_tpu.models.base import SlotLayout
    from airv2x_tpu.ops.anchors import (
        anchor_standup_boxes,
        generate_anchor_grid,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hypes = load_yaml(
        os.path.join(repo, "hypes_yaml/test/tiny_where2comm.yaml")
    )
    model = build_model(hypes)
    layout = SlotLayout.from_args(hypes["model"]["args"])
    anchors = generate_anchor_grid(hypes["postprocess"]["anchor_args"])
    standup = anchor_standup_boxes(anchors)
    nprng = np.random.default_rng(3)
    batch, _ = make_batch(
        nprng,
        layout,
        batch_size=2,
        anchors=anchors,
        anchor_standup=standup,
        target_args=hypes["postprocess"]["target_args"],
        num_objects=4,
        points_per_agent=512,
        lidar_range=hypes["preprocess"]["cav_lidar_range"],
        max_boxes=hypes["postprocess"]["max_num"],
        pts_per_box=40,
    )
    batch = jax.tree.map(jnp.asarray, batch)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)},
        batch,
    )
    loss_fn = build_loss(hypes)
    tx = optax.sgd(1.0)  # update == gradient: exact equivalence check
    state = create_train_state(model, variables, tx)

    step = make_train_step(model, loss_fn, tx, donate=False, accum_steps=2)
    rng = jax.random.PRNGKey(11)
    new_state, parts = step(state, batch, rng)

    # manual twin: two sequential B=1 microbatches, stats threaded, grads
    # averaged, ONE sgd(1.0) update
    def forward(params, stats, mb, r):
        out, upd = model.apply(
            {"params": params, "batch_stats": stats}, mb, train=True,
            rngs={"comm": r, "diffusion": jax.random.fold_in(r, 1),
                  "dropout": jax.random.fold_in(r, 2)},
            mutable=["batch_stats"],
        )
        total, p = loss_fn(out, mb["labels"])
        return total, (p, upd["batch_stats"])

    b = int(batch["points"].shape[0])

    def slice_mb(i):
        return jax.tree.map(
            lambda x: x[i:i + 1]
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == b
            else x,
            batch,
        )

    base = jax.random.fold_in(rng, state.step)
    stats = state.batch_stats
    grads_sum = jax.tree.map(lambda p: jnp.zeros_like(p), state.params)
    grad_fn = jax.jit(jax.value_and_grad(forward, has_aux=True))
    for i in range(2):
        (_, (_, stats)), g = grad_fn(
            state.params, stats, slice_mb(i), jax.random.fold_in(base, 3 * i)
        )
        grads_sum = jax.tree.map(jnp.add, grads_sum, g)
    grads = jax.tree.map(lambda g: g / 2, grads_sum)
    upd, _ = tx.update(grads, state.opt_state, state.params)
    want_params = optax.apply_updates(state.params, upd)

    # accum path (one scan program) vs manual path (two unrolled programs):
    # XLA reassociates f32 sums differently per program, so exact-match is
    # impossible; measured worst case is ~9e-5 abs / 1.6e-3 rel on this graph
    tol = dict(rtol=3e-3, atol=2e-4)
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), **tol
        ),
        new_state.params, want_params,
    )
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), **tol
        ),
        new_state.batch_stats, stats,
    )
    assert np.isfinite(float(parts["total_loss"]))


def test_accum_1_unchanged():
    """accum_steps=1 is the plain path (no scan) — same result as before."""
    model, tx, state, batch = _setup(4)
    s1 = make_train_step(model, _loss, tx, donate=False, accum_steps=1)
    ns, parts = s1(state, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(parts["total_loss"]))
    assert int(ns.step) == 1
