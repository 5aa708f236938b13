"""Perspective 3D canvas (capability twin of simple_plot3d/canvas_3d.py).

Renders point clouds and 3D boxes from a configurable camera with a simple
pinhole projection + painter's z-ordering. Pure numpy + PIL.
"""

from __future__ import annotations

import numpy as np

from airv2x_tpu.utils import transforms as tf


class Canvas3D:
    def __init__(
        self,
        canvas_shape=(600, 1000),
        camera_pose=(-25.0, 0.0, 18.0, 0.0, 0.0, -35.0),  # x y z roll yaw pitch
        fov_deg: float = 70.0,
    ):
        self.h, self.w = canvas_shape
        self.canvas = np.zeros((self.h, self.w, 3), np.uint8)
        self.depth = np.full((self.h, self.w), np.inf, np.float32)
        cam_world = tf.pose_to_world(camera_pose)
        self.world_to_cam = np.linalg.inv(cam_world)
        self.f = (self.w / 2) / np.tan(np.radians(fov_deg) / 2)

    def _project(self, pts):
        """(N, 3) world -> (N, 2) pixel + (N,) depth + validity."""
        cam = pts @ self.world_to_cam[:3, :3].T + self.world_to_cam[:3, 3]
        # camera x forward, y left, z up -> image u right, v down
        depth = cam[:, 0]
        ok = depth > 0.5
        u = self.w / 2 - self.f * cam[:, 1] / np.maximum(depth, 1e-6)
        v = self.h / 2 - self.f * cam[:, 2] / np.maximum(depth, 1e-6)
        return np.stack([v, u], axis=-1), depth, ok

    def draw_points(self, pts, color=(255, 255, 255)):
        if len(pts) == 0:
            return
        px, depth, ok = self._project(np.asarray(pts)[:, :3])
        px = px[ok].astype(np.int32)
        depth = depth[ok]
        keep = (
            (px[:, 0] >= 0) & (px[:, 0] < self.h)
            & (px[:, 1] >= 0) & (px[:, 1] < self.w)
        )
        px, depth = px[keep], depth[keep]
        closer = depth < self.depth[px[:, 0], px[:, 1]]
        px, depth = px[closer], depth[closer]
        self.canvas[px[:, 0], px[:, 1]] = color
        self.depth[px[:, 0], px[:, 1]] = depth

    _EDGES = [
        (0, 1), (1, 2), (2, 3), (3, 0),
        (4, 5), (5, 6), (6, 7), (7, 4),
        (0, 4), (1, 5), (2, 6), (3, 7),
    ]

    def draw_boxes(self, corners3d, color=(255, 60, 60)):
        """corners3d: (N, 8, 3) box corners."""
        for box in np.asarray(corners3d):
            px, depth, ok = self._project(box)
            for a, b in self._EDGES:
                if not (ok[a] and ok[b]):
                    continue
                self._line(px[a], px[b], color)

    def _line(self, a, b, color):
        n = int(max(abs(b[0] - a[0]), abs(b[1] - a[1]))) + 1
        n = min(n, 4 * max(self.h, self.w))
        ys = np.linspace(a[0], b[0], n)
        xs = np.linspace(a[1], b[1], n)
        keep = (ys >= 0) & (ys < self.h) & (xs >= 0) & (xs < self.w)
        self.canvas[ys[keep].astype(np.int32), xs[keep].astype(np.int32)] = color

    def save(self, path: str):
        from PIL import Image

        Image.fromarray(self.canvas).save(path)
