import jax.numpy as jnp
import numpy as np

from airv2x_tpu.data.augment import DataAugmentor
from airv2x_tpu.loss import LOSS_REGISTRY


def test_augmentor_geometry_consistency(rng):
    pts = rng.normal(scale=10, size=(500, 4)).astype(np.float32)
    boxes = np.array([[5.0, 3.0, -1.0, 1.5, 1.6, 3.9, 0.4]], np.float32)
    # put one point exactly at the box center
    pts[0, :3] = boxes[0, :3]
    aug = DataAugmentor(
        [
            {"NAME": "random_world_flip", "ALONG_AXIS_LIST": ["x"]},
            {"NAME": "random_world_rotation", "WORLD_ROT_ANGLE": [-0.7, 0.7]},
            {"NAME": "random_world_scaling", "WORLD_SCALE_RANGE": [0.9, 1.1]},
        ],
        train=True,
    )
    p2, b2 = aug(pts, boxes, rng)
    # the box-center point must track the box center through all transforms
    np.testing.assert_allclose(p2[0, :3], b2[0, :3], atol=1e-5)
    # eval mode is a no-op
    aug_eval = DataAugmentor([{"NAME": "random_world_flip"}], train=False)
    p3, b3 = aug_eval(pts, boxes, rng)
    np.testing.assert_array_equal(p3, pts)


def test_coalign_loss_iou_term(rng):
    from airv2x_tpu.ops.anchors import generate_anchor_grid

    loss_fn = LOSS_REGISTRY["point_pillar_loss_coalign"](
        {"cls_weight": 1.0, "reg": 2.0, "iou_weight": 1.0}
    )
    aargs = {
        "W": 16, "H": 16, "l": 3.9, "w": 1.6, "h": 1.56, "r": [0, 90],
        "feature_stride": 2, "vw": 0.4, "vh": 0.4,
        "cav_lidar_range": [-3.2, -3.2, -3, 3.2, 3.2, 1],
    }
    anchors = generate_anchor_grid(aargs)
    h, w, a = anchors.shape[:3]
    out = {
        "psm": jnp.zeros((1, h, w, a)),
        "rm": jnp.zeros((1, h, w, 7 * a)),
    }
    pos = np.zeros((1, h, w, a), np.float32)
    pos[0, 2, 3, 0] = 1
    target = {
        "pos_equal_one": jnp.asarray(pos),
        "targets": jnp.zeros((1, h, w, a * 7)),
        "anchors": jnp.asarray(anchors),
    }
    # pred == target (zero deltas) -> IoU 1 -> iou_loss 0
    total0, parts0 = loss_fn(out, target)
    assert abs(float(parts0["iou_loss"])) < 1e-4
    # shifted prediction -> iou_loss > 0
    rm = np.zeros((1, h, w, a, 7), np.float32)
    rm[0, 2, 3, 0, 0] = 0.5
    out2 = {"psm": out["psm"], "rm": jnp.asarray(rm.reshape(1, h, w, a * 7))}
    _, parts1 = loss_fn(out2, target)
    assert float(parts1["iou_loss"]) > 0.1


def test_focal_seg_loss_golden():
    """focal_seg_loss vs the reference FocalSegLoss (loss/focal_seg_loss.py)
    on random logits, incl. scalar-alpha and ignore_index modes."""
    import sys
    sys.path.insert(0, "/root/repo")
    from tests.reference_stubs import install_reference_stubs
    install_reference_stubs()
    import torch
    from opencood.loss.focal_seg_loss import FocalSegLoss

    from airv2x_tpu.loss import build_loss

    rng = np.random.default_rng(5)
    b, h, w, cd, cs = 2, 8, 10, 8, 3
    dyn = rng.normal(size=(b, h, w, cd)).astype(np.float32)
    sta = rng.normal(size=(b, h, w, cs)).astype(np.float32)
    dlab = rng.integers(0, cd, (b, h, w))
    slab = rng.integers(0, cs, (b, h, w))

    for extra in ({}, {"ignore_index": 0}):
        args = {"gamma": 2.0, "alpha": 0.75, "reduction": "mean", **extra}
        ref = FocalSegLoss(args)
        want = ref(
            {"dynamic_seg": torch.from_numpy(dyn).permute(0, 3, 1, 2),
             "static_seg": torch.from_numpy(sta).permute(0, 3, 1, 2)},
            {"dynamic_seg_label": torch.from_numpy(dlab),
             "static_seg_label": torch.from_numpy(slab)},
        ).item()
        loss_fn = build_loss({
            "loss": {"core_method": "focal_seg_loss", "args": args},
            "model": {"args": {"task": "seg"}},
        })
        got, parts = loss_fn(
            {"dynamic_seg": jnp.asarray(dyn), "static_seg": jnp.asarray(sta)},
            {"dynamic_seg_label": jnp.asarray(dlab),
             "static_seg_label": jnp.asarray(slab)},
        )
        assert abs(float(got) - want) < 1e-5, (extra, float(got), want)


def test_augment_golden_vs_reference():
    """random flip / global rotation / global scaling vs the reference
    augment_utils (forced transform values via np.random monkeypatch)."""
    import sys
    sys.path.insert(0, "/root/repo")
    from tests.reference_stubs import install_reference_stubs
    install_reference_stubs()
    from opencood.data_utils.augmentor import augment_utils

    from airv2x_tpu.data.augment import (
        random_world_flip,
        random_world_rotation,
        random_world_scaling,
    )

    rng = np.random.default_rng(11)
    pts = rng.normal(size=(50, 4)).astype(np.float64)
    boxes = rng.normal(size=(6, 7)).astype(np.float64)

    class Forced:
        """rng stub: uniform() -> value below 0.5 (enable flips) or the
        forced noise value for rotation/scaling."""

        def __init__(self, val):
            self.val = val

        def uniform(self, *a):
            return self.val if a else 0.0  # 0.0 < 0.5 enables flips

    # flips: force enable on the reference side too
    orig_choice = np.random.choice
    np.random.choice = lambda *a, **k: True
    try:
        w_b, w_p = augment_utils.random_flip_along_x(
            boxes.copy(), pts.copy()
        )
        g_p, g_b = random_world_flip(pts, boxes, Forced(0.0), along=("x",))
        np.testing.assert_allclose(g_p, w_p)
        np.testing.assert_allclose(g_b, w_b)
        w_b, w_p = augment_utils.random_flip_along_y(
            boxes.copy(), pts.copy()
        )
        g_p, g_b = random_world_flip(pts, boxes, Forced(0.0), along=("y",))
        np.testing.assert_allclose(g_p, w_p)
        np.testing.assert_allclose(g_b, w_b)
    finally:
        np.random.choice = orig_choice

    # rotation / scaling: force the noise draw
    ang, scale = 0.37, 1.042
    orig_uniform = np.random.uniform
    np.random.uniform = lambda *a, **k: ang
    try:
        w_b, w_p = augment_utils.global_rotation(
            boxes.copy(), pts.copy(), [0, 1]
        )
    finally:
        np.random.uniform = orig_uniform
    g_p, g_b = random_world_rotation(pts, boxes, Forced(ang), (0, 1))
    # reference rotates through torch float32 (common_utils
    # check_numpy_to_torch) — fp32-level agreement is the exact target
    np.testing.assert_allclose(g_p, w_p, atol=3e-6)
    np.testing.assert_allclose(g_b, w_b, atol=3e-6)

    np.random.uniform = lambda *a, **k: scale
    try:
        w_b, w_p = augment_utils.global_scaling(
            boxes.copy(), pts.copy(), [0.9, 1.1]
        )
    finally:
        np.random.uniform = orig_uniform
    g_p, g_b = random_world_scaling(pts, boxes, Forced(scale), (0.9, 1.1))
    np.testing.assert_allclose(g_p, w_p)
    np.testing.assert_allclose(g_b, w_b)
