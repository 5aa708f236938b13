"""End-to-end smoke: synthetic scene -> model forward -> loss -> decode -> AP."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airv2x_tpu.config import load_yaml
from airv2x_tpu.data.postprocess import decode_detections
from airv2x_tpu.data.synthetic import make_batch
from airv2x_tpu.eval.ap import accumulate_tp_fp, eval_final_results, new_result_stat
from airv2x_tpu.loss import build_loss
from airv2x_tpu.models import build_model
from airv2x_tpu.models.base import SlotLayout
from airv2x_tpu.ops import geometry as geo
from airv2x_tpu.ops.anchors import anchor_standup_boxes, generate_anchor_grid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def setup():
    hypes = load_yaml(os.path.join(REPO, "hypes_yaml/test/tiny_where2comm.yaml"))
    model = build_model(hypes)
    layout = SlotLayout.from_args(hypes["model"]["args"])
    anchors = generate_anchor_grid(hypes["postprocess"]["anchor_args"])
    standup = anchor_standup_boxes(anchors)
    rng = np.random.default_rng(0)
    batch, gt = make_batch(
        rng,
        layout,
        batch_size=2,
        anchors=anchors,
        anchor_standup=standup,
        target_args=hypes["postprocess"]["target_args"],
        num_objects=6,
        points_per_agent=2048,
        lidar_range=hypes["preprocess"]["cav_lidar_range"],
        max_boxes=hypes["postprocess"]["max_num"],
        pts_per_box=60,
    )
    batch = jax.tree.map(jnp.asarray, batch)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)},
        batch,
        train=False,
    )
    return hypes, model, layout, anchors, batch, gt, variables


def test_forward_shapes(setup):
    hypes, model, layout, anchors, batch, gt, variables = setup
    out = model.apply(variables, batch, train=False)
    h, w = anchors.shape[:2]
    assert out["psm"].shape == (2, h, w, 2 * 7)
    assert out["rm"].shape == (2, h, w, 14)
    assert out["obj"].shape == (2, h, w, 2)
    assert np.isfinite(np.asarray(out["psm"])).all()
    assert 0.0 <= float(out["comm_rate"]) <= 1.0


def test_forward_train_mode_runs(setup):
    hypes, model, layout, anchors, batch, gt, variables = setup
    out, updates = model.apply(
        variables,
        batch,
        train=True,
        rngs={"comm": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert "batch_stats" in updates
    assert np.isfinite(np.asarray(out["rm"])).all()


@pytest.mark.slow
def test_loss_finite_and_grads(setup):
    hypes, model, layout, anchors, batch, gt, variables = setup
    loss_fn = build_loss(hypes)

    def compute(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch,
            train=True,
            rngs={"comm": jax.random.PRNGKey(3)},
            mutable=["batch_stats"],
        )
        total, parts = loss_fn(out, batch["labels"])
        return total

    val, grads = jax.value_and_grad(compute)(variables["params"])
    assert np.isfinite(float(val))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_decode_and_eval_pipeline(setup):
    hypes, model, layout, anchors, batch, gt, variables = setup
    out = model.apply(variables, batch, train=False)
    lr = jnp.asarray(hypes["preprocess"]["cav_lidar_range"], jnp.float32)
    det = decode_detections(
        out["psm"][0],
        out["rm"][0],
        out["obj"][0],
        jnp.asarray(anchors),
        jnp.eye(4),
        lr,
        num_class=hypes["num_class"],
        obj_threshold=hypes["postprocess"]["target_args"]["obj_threshold"],
        nms_thresh=hypes["postprocess"]["nms_thresh"],
        top_k=256,
    )
    n = anchors.shape[0] * anchors.shape[1] * anchors.shape[2]
    # decode returns a fixed top-(2*top_k) candidate pool, not all N anchors
    assert det.boxes.shape == (min(2 * 256, n), 7)
    assert det.mask.dtype == bool

    # run the eval harness with (untrained) predictions + gt
    stat = new_result_stat()
    keep = np.asarray(det.mask)
    det_corners = np.asarray(det.corners)[keep][:, :4, :2]
    det_scores = np.asarray(det.scores)[keep]
    gt_boxes = gt["boxes"][0][gt["mask"][0]]
    gt_corners = np.asarray(
        geo.boxes_to_corners_bev(jnp.asarray(gt_boxes), order="hwl")
    )
    for t in (0.3, 0.5, 0.7):
        accumulate_tp_fp(det_corners, det_scores, gt_corners, stat, t)
    res = eval_final_results(stat)
    assert set(res) == {"ap_30", "ap_50", "ap_70"}
    assert all(0.0 <= v <= 1.0 for v in res.values())
