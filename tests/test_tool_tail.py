"""Tool-tail coverage: debug_utils / inference_tiny / inference_pretrained
(reference opencood/tools/{debug_utils,inference_tiny,inference_pretrained}.py)
plus regressions for the jit-vs-eager rotated-IoU bug the label round trip
caught, and the expanded Canvas3D API."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

TINY = os.path.join(
    os.path.dirname(__file__), "..", "hypes_yaml", "test",
    "tiny_where2comm.yaml",
)


def test_identical_quads_iou_one_under_jit():
    """Regression: FMA fusion under jit left ~1e-6 cross-product residuals
    for a corner on its own quad's edge; with the old absolute 1e-8 epsilon,
    identical quads scored IoU ~0 jitted (1.0 eagerly) and equal-score
    duplicates survived NMS."""
    from airv2x_tpu.ops.rotated_iou import pairwise_quad_iou

    q = np.array(
        [[[-13.119, 6.284], [-14.601, 5.945],
          [-13.614, 1.629], [-12.132, 1.968]]], np.float32
    )
    qq = jnp.asarray(np.concatenate([q, q], 0))
    out = np.asarray(jax.jit(pairwise_quad_iou)(qq, qq))
    np.testing.assert_allclose(out, 1.0, atol=1e-5)


def test_nms_suppresses_equal_score_duplicates_under_jit():
    from airv2x_tpu.ops.nms import rotated_nms

    q = np.array(
        [[[-13.119, 6.284], [-14.601, 5.945],
          [-13.614, 1.629], [-12.132, 1.968]]], np.float32
    )
    corners = np.concatenate([q, q, q + 30.0], 0)
    scores = np.array([0.99995446, 0.99995446, 0.9], np.float32)
    keep = np.asarray(
        rotated_nms(
            jnp.asarray(corners), jnp.asarray(scores),
            jnp.ones(3, bool), 0.15, top_k=512,
        )
    )
    assert keep.sum() == 2 and keep[2]


def _run_tool(main, argv):
    old = sys.argv
    sys.argv = argv
    try:
        main()
    finally:
        sys.argv = old


@pytest.mark.slow
def test_debug_utils_round_trip(tmp_path):
    """Label map -> decode must be the identity on decodable gts (AP 1.0);
    the tool exits nonzero otherwise."""
    from airv2x_tpu.tools.debug_utils import main

    out = str(tmp_path / "bev.png")
    _run_tool(main, ["debug_utils", "--hypes_yaml", TINY,
                     "--num_scenes", "2", "--out", out])
    assert os.path.exists(out)


@pytest.mark.slow
def test_inference_tiny_writes_per_frame_renders(tmp_path):
    from airv2x_tpu.config import load_yaml, save_yaml
    from airv2x_tpu.tools.inference_tiny import main

    run = tmp_path / "run"
    run.mkdir()
    save_yaml(load_yaml(TINY), str(run / "config.yaml"))
    _run_tool(main, ["t", "--model_dir", str(run),
                     "--num_scenes", "2", "--max_samples", "2"])
    vis = run / "vis"
    assert (vis / "bev_00000.png").exists()
    assert (vis / "3d_00001.png").exists()
    assert "AP@0.3" in (run / "results.txt").read_text()


@pytest.mark.slow
def test_inference_pretrained_from_bare_checkpoint(tmp_path):
    """--model_path on an orbax net_epoch dir + --comm_thre + --save_npy."""
    from airv2x_tpu.config import load_yaml, save_yaml
    from airv2x_tpu.data.synthetic import make_scene
    from airv2x_tpu.models import build_model
    from airv2x_tpu.models.base import SlotLayout
    from airv2x_tpu.parallel.train import create_train_state, make_optimizer
    from airv2x_tpu.tools.inference_pretrained import main
    from airv2x_tpu.utils.checkpoint import save_checkpoint

    run = tmp_path / "run"
    run.mkdir()
    hypes = load_yaml(TINY)
    save_yaml(hypes, str(run / "config.yaml"))
    model = build_model(hypes)
    layout = SlotLayout.from_args(hypes["model"]["args"])
    rng = np.random.default_rng(0)
    scene, _ = make_scene(
        rng, layout, points_per_agent=512,
        lidar_range=hypes["preprocess"]["cav_lidar_range"],
    )
    ex = jax.tree.map(lambda x: jnp.asarray(x)[None], scene)
    v = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)}, ex
    )
    tx, _ = make_optimizer(hypes)
    save_checkpoint(
        str(run), 1, jax.device_get(create_train_state(model, v, tx))
    )

    _run_tool(main, [
        "t", "--model_path", str(run / "net_epoch1"),
        "--hypes_yaml", str(run / "config.yaml"),
        "--num_scenes", "2", "--comm_thre", "0.5",
        "--save_npy", "--save_vis_n", "1",
    ])
    assert (run / "npy" / "0001_pred.npy").exists()
    assert (run / "vis_0000.png").exists()
    assert "comm_rate" in (run / "results.txt").read_text()


def test_canvas3d_reference_api(tmp_path):
    """Reference surface: center/focus camera, cmap points with operand,
    circle radius, box texts, 3D lines, left-hand mirroring."""
    from airv2x_tpu.visualization.canvas_3d import Canvas3D

    rng = np.random.default_rng(0)
    c = Canvas3D(
        canvas_shape=(100, 160),
        camera_center_coords=(-20, 0, 10),
        camera_focus_coords=(-19.06, 0, 9.56),
        canvas_bg_color=(255, 255, 255),
    )
    pts = rng.uniform(-10, 10, (300, 3)).astype(np.float32)
    xy, ok, depth = c.get_canvas_coords(pts, return_depth=True)
    assert ok.any() and (depth[ok] > 0).all()
    c.draw_canvas_points(xy[ok], radius=1, colors="viridis",
                         colors_operand=depth[ok])
    box = np.array([[[8, -1, 0], [8, 1, 0], [12, 1, 0], [12, -1, 0],
                     [8, -1, 1.5], [8, 1, 1.5], [12, 1, 1.5],
                     [12, -1, 1.5]]], np.float32)
    c.draw_boxes(box, colors=(255, 0, 0), texts=["car 0.97"])
    c.draw_lines(np.array([[0, 0, 0.0]]), np.array([[5, 0, 0.0]]),
                 colors=(0, 0, 255))
    p = tmp_path / "c3d.png"
    c.save(str(p))
    assert p.stat().st_size > 0
    # not all-background anymore
    assert (c.canvas != 255).any()

    # left-hand mirrors the y axis of both camera and points
    a = Canvas3D(canvas_shape=(50, 80), left_hand=False)
    b = Canvas3D(canvas_shape=(50, 80), left_hand=True)
    pt = np.array([[5.0, 3.0, 0.0]])
    xa, oka = a.get_canvas_coords(pt)
    xb, okb = b.get_canvas_coords(pt)
    assert oka[0] and okb[0]
    assert xa[0, 0] == xb[0, 0]  # same row
    assert xa[0, 1] != xb[0, 1]  # mirrored column
