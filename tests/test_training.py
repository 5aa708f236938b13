"""Training-step tests: loss decreases, freezing works, multi-chip dry run."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airv2x_tpu.config import load_yaml
from airv2x_tpu.data.synthetic import make_batch
from airv2x_tpu.loss import build_loss
from airv2x_tpu.models import build_model
from airv2x_tpu.models.base import SlotLayout
from airv2x_tpu.ops.anchors import anchor_standup_boxes, generate_anchor_grid
from airv2x_tpu.parallel.train import (
    backbone_fix_prefixes,
    create_train_state,
    freeze_by_path,
    make_optimizer,
    make_train_step,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def setup():
    hypes = load_yaml(os.path.join(REPO, "hypes_yaml/test/tiny_where2comm.yaml"))
    model = build_model(hypes)
    layout = SlotLayout.from_args(hypes["model"]["args"])
    anchors = generate_anchor_grid(hypes["postprocess"]["anchor_args"])
    standup = anchor_standup_boxes(anchors)
    rng = np.random.default_rng(7)
    batch, _ = make_batch(
        rng,
        layout,
        batch_size=2,
        anchors=anchors,
        anchor_standup=standup,
        target_args=hypes["postprocess"]["target_args"],
        num_objects=5,
        points_per_agent=1024,
        lidar_range=hypes["preprocess"]["cav_lidar_range"],
        max_boxes=hypes["postprocess"]["max_num"],
        pts_per_box=50,
    )
    batch = jax.tree.map(jnp.asarray, batch)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)}, batch
    )
    return hypes, model, batch, variables


def test_train_steps_decrease_loss(setup):
    hypes, model, batch, variables = setup
    loss_fn = build_loss(hypes)
    tx, _ = make_optimizer(hypes, steps_per_epoch=100)
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, loss_fn, tx, donate=False)
    rng = jax.random.PRNGKey(0)

    losses = []
    for _ in range(8):
        state, parts = step(state, batch, rng)
        losses.append(float(parts["total_loss"]))
    assert np.isfinite(losses).all()
    # overfitting one batch must reduce the loss substantially
    assert losses[-1] < losses[0] * 0.9, losses


def test_freeze_by_path(setup):
    hypes, model, batch, variables = setup
    loss_fn = build_loss(hypes)
    tx, _ = make_optimizer(hypes, steps_per_epoch=100)
    frozen_prefixes = ["vehicle_pillar_vfe"]
    tx_frozen = freeze_by_path(tx, variables["params"], frozen_prefixes)
    state = create_train_state(model, variables, tx_frozen)
    step = make_train_step(model, loss_fn, tx_frozen, donate=False)

    before = jax.tree.map(lambda x: x.copy(), state.params)
    state, _ = step(state, batch, jax.random.PRNGKey(0))

    def subtree(p, name):
        return [
            v
            for k, v in jax.tree_util.tree_leaves_with_path(p)
            if name in jax.tree_util.keystr(k)
        ]

    froz_before = subtree(before, "vehicle_pillar_vfe")
    froz_after = subtree(state.params, "vehicle_pillar_vfe")
    for a, b in zip(froz_before, froz_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    live_before = subtree(before, "rsu_pillar_vfe")
    live_after = subtree(state.params, "rsu_pillar_vfe")
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(live_before, live_after)
    )


def test_backbone_fix_prefixes():
    assert backbone_fix_prefixes({"backbone_fix": False}) == []
    full = backbone_fix_prefixes({"backbone_fix": True})
    assert "encoder" in full and "backbone" in full
    partial = backbone_fix_prefixes({"backbone_fix": ["rsu", "drone"]})
    assert partial == ["rsu_pillar_vfe", "drone_pillar_vfe"]


@pytest.mark.slow
def test_dryrun_multichip():
    sys.path.insert(0, REPO)
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_resolve_grad_accum_auto_rule():
    from airv2x_tpu.tools.train import resolve_grad_accum

    # auto: microbatches of 2 only above the measured B=2 sweet spot
    assert resolve_grad_accum(0, 1) == 1
    assert resolve_grad_accum(0, 2) == 1
    assert resolve_grad_accum(0, 3) == 1  # odd: no clean microbatch split
    assert resolve_grad_accum(0, 4) == 2
    assert resolve_grad_accum(0, 8) == 4
    # explicit values pass through untouched
    assert resolve_grad_accum(1, 4) == 1
    assert resolve_grad_accum(3, 6) == 3
