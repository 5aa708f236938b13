import numpy as np

from airv2x_tpu.utils import transforms as tf


def test_pose_to_world_identity():
    T = tf.pose_to_world([0, 0, 0, 0, 0, 0])
    np.testing.assert_allclose(T, np.eye(4))


def test_pose_to_world_translation_only():
    T = tf.pose_to_world([1.0, -2.0, 3.0, 0, 0, 0])
    np.testing.assert_allclose(T[:3, 3], [1.0, -2.0, 3.0])
    np.testing.assert_allclose(T[:3, :3], np.eye(3))


def test_pose_to_world_pure_yaw():
    # yaw=90deg: x-axis of the body frame maps to world +y.
    T = tf.pose_to_world([0, 0, 0, 0, 90.0, 0])
    p = T[:3, :3] @ np.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(p, [0.0, 1.0, 0.0], atol=1e-12)


def test_pose_to_world_pure_pitch():
    # pitch=90deg: body x-axis maps to world +z (Carla convention).
    T = tf.pose_to_world([0, 0, 0, 0, 0, 90.0])
    p = T[:3, :3] @ np.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(p, [0.0, 0.0, 1.0], atol=1e-12)


def test_rotation_orthonormal(rng):
    for _ in range(20):
        pose = rng.uniform(-180, 180, size=6)
        R = tf.pose_to_world(pose)[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        assert np.linalg.det(R) > 0.999


def test_pose_a_to_b_roundtrip(rng):
    pa = rng.uniform(-50, 50, size=6)
    pb = rng.uniform(-50, 50, size=6)
    t_ab = tf.pose_a_to_b(pa, pb)
    t_ba = tf.pose_a_to_b(pb, pa)
    np.testing.assert_allclose(t_ab @ t_ba, np.eye(4), atol=1e-9)


def test_pose_a_to_b_composition(rng):
    pa, pb, pc = (rng.uniform(-50, 50, size=6) for _ in range(3))
    direct = tf.pose_a_to_b(pa, pc)
    via_b = tf.pose_a_to_b(pb, pc) @ tf.pose_a_to_b(pa, pb)
    np.testing.assert_allclose(direct, via_b, atol=1e-9)


def test_transform_points_keeps_features(rng):
    pts = rng.normal(size=(10, 4))
    T = tf.pose_to_world(rng.uniform(-50, 50, size=6))
    out = tf.transform_points(pts, T)
    np.testing.assert_allclose(out[:, 3], pts[:, 3])
    # distance preserved (rigid)
    d0 = np.linalg.norm(pts[0, :3] - pts[1, :3])
    d1 = np.linalg.norm(out[0, :3] - out[1, :3])
    np.testing.assert_allclose(d0, d1, atol=1e-9)
