import numpy as np

from airv2x_tpu.visualization.bev_canvas import CanvasBEV, visualize


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
