import numpy as np

from airv2x_tpu.visualization.bev_canvas import CanvasBEV, visualize
from airv2x_tpu.visualization.canvas_3d import Canvas3D


def test_canvas_points_and_boxes(tmp_path, rng):
    lr = (-20, -20, -3, 20, 20, 1)
    canvas = CanvasBEV(canvas_shape=(100, 100), lidar_range=lr)
    pts = rng.uniform(-19, 19, (500, 3))
    canvas.draw_points(pts, (255, 255, 255))
    assert canvas.canvas.sum() > 0
    quad = np.array([[[-5, -5], [5, -5], [5, 5], [-5, 5]]], np.float32)
    canvas.draw_boxes(quad, (255, 0, 0), thickness=2)
    # red channel has box pixels
    assert (canvas.canvas[..., 0] == 255).sum() > (canvas.canvas[..., 2] == 255).sum()
    p = tmp_path / "bev.png"
    canvas.save(str(p))
    assert p.exists() and p.stat().st_size > 0


def test_visualize_frame(tmp_path, rng):
    lr = (-20, -20, -3, 20, 20, 1)
    pred = rng.uniform(-10, 10, (3, 4, 2))
    gt = rng.uniform(-10, 10, (2, 8, 3))
    pts = rng.uniform(-19, 19, (200, 4))
    img = visualize(pred, gt, pts, lr, save_path=str(tmp_path / "f.png"),
                    canvas_shape=(80, 80))
    assert img.shape == (80, 80, 3)
    assert (tmp_path / "f.png").exists()


def test_canvas3d_points_boxes(tmp_path, rng):
    canvas = Canvas3D(canvas_shape=(120, 200))
    pts = rng.uniform(-15, 15, (800, 3))
    pts[:, 2] = rng.uniform(-1.5, 0.5, 800)
    canvas.draw_points(pts, (200, 200, 200))
    assert canvas.canvas.sum() > 0
    # an axis-aligned 4x2x1.5 box ahead of the camera
    x, y, z = np.meshgrid([8, 12], [-1, 1], [0, 1.5], indexing="ij")
    corners = np.stack([x.ravel(), y.ravel(), z.ravel()], -1)[None]
    before_red = (canvas.canvas[..., 0] > canvas.canvas[..., 2]).sum()
    canvas.draw_boxes(corners, (255, 60, 60))
    after_red = (canvas.canvas[..., 0] > canvas.canvas[..., 2]).sum()
    assert after_red > before_red
    p = tmp_path / "p3d.png"
    canvas.save(str(p))
    assert p.exists() and p.stat().st_size > 0


def test_canvas3d_behind_camera_clipped(rng):
    canvas = Canvas3D(canvas_shape=(60, 80))
    # points far behind the camera must not render
    pts = np.tile(np.array([[-200.0, 0.0, 0.0]]), (50, 1))
    canvas.draw_points(pts)
    assert canvas.canvas.sum() == 0
