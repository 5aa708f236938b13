"""Segmentation-task end-to-end: forward + loss on the tiny config."""

import copy
import os

import jax
import jax.numpy as jnp
import numpy as np

from airv2x_tpu.config import load_yaml
from airv2x_tpu.data.synthetic import make_batch
from airv2x_tpu.loss import build_loss
from airv2x_tpu.models import build_model
from airv2x_tpu.models.base import SlotLayout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_seg_forward_and_loss():
    hypes = copy.deepcopy(
        load_yaml(os.path.join(REPO, "hypes_yaml/test/tiny_where2comm.yaml"))
    )
    hypes["model"]["args"]["task"] = "seg"
    model = build_model(hypes)
    layout = SlotLayout.from_args(hypes["model"]["args"])
    rng = np.random.default_rng(0)
    batch, _ = make_batch(
        rng,
        layout,
        batch_size=1,
        num_objects=3,
        points_per_agent=512,
        lidar_range=hypes["preprocess"]["cav_lidar_range"],
        max_boxes=50,
        pts_per_box=30,
    )
    batch = jax.tree.map(jnp.asarray, batch)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)}, batch
    )
    out = model.apply(variables, batch, train=False)
    hw = hypes["seg_hw"]
    # dynamic_class=7 includes the background class (reference
    # segmentation_head.py passes dynamic_class straight to the 1x1 conv)
    assert out["dynamic_seg"].shape == (1, hw, hw, 7)
    assert out["static_seg"].shape == (1, hw, hw, 3)
    assert np.isfinite(np.asarray(out["dynamic_seg"])).all()

    loss_fn = build_loss(hypes)
    target = {
        "dynamic_seg_label": jnp.zeros((1, hw, hw), jnp.int32)
        .at[0, 10:20, 10:20]
        .set(2),
        "static_seg_label": jnp.zeros((1, hw, hw), jnp.int32),
    }
    total, parts = loss_fn(out, target)
    assert np.isfinite(float(total))
    assert "dynamic_loss" in parts


def test_seg_postprocess():
    from airv2x_tpu.data.postprocess import decode_segmentation

    probs_dyn = jnp.zeros((1, 16, 16, 8)).at[0, :4, :, 2].set(5.0)
    probs_sta = jnp.zeros((1, 16, 16, 3)).at[0, :, :8, 1].set(5.0)
    dyn, sta = decode_segmentation(probs_dyn, probs_sta)
    assert np.asarray(dyn)[0, 0, 0] == 2
    assert np.asarray(dyn)[0, 10, 0] == 0
    assert np.asarray(sta)[0, 0, 0] == 1
