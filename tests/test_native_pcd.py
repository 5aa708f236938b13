"""Native fastpcd loader: parity with the python reader + processing."""

import numpy as np
import pytest

from airv2x_tpu.data import native
from airv2x_tpu.data.pcd import write_pcd
from airv2x_tpu.utils import transforms as tf


@pytest.fixture(scope="module")
def built():
    if not native.ensure_built():
        pytest.skip("native toolchain unavailable")
    return True


def test_native_parity_binary(tmp_path, rng, built):
    pts = rng.uniform(-30, 30, (500, 4)).astype(np.float32)
    p = tmp_path / "a.pcd"
    write_pcd(str(p), pts)
    out = np.zeros((600, 4), np.float32)
    n = native.load_pcd_into(str(p), out)
    assert native.native_available()
    assert n == 500
    np.testing.assert_allclose(out[:n], pts, atol=1e-6)


def test_native_full_pipeline(tmp_path, rng, built):
    pts = rng.uniform(-30, 30, (1000, 4)).astype(np.float32)
    pts[:50, :2] = 0.5  # carrier points to be ego-masked
    p = tmp_path / "b.pcd"
    write_pcd(str(p), pts)

    T = tf.pose_to_world([3.0, -2.0, 0.5, 0, 25.0, 0]).astype(np.float32)
    lr = np.array([-20, -20, -25, 20, 20, 25], np.float32)

    out = np.zeros((1200, 4), np.float32)
    n = native.load_pcd_into(str(p), out, transform=T, lidar_range=lr, ego_mask=2.0)

    # reference: python pipeline
    keep = ~((np.abs(pts[:, 0]) < 2.0) & (np.abs(pts[:, 1]) < 2.0))
    ref = tf.transform_points(pts[keep].astype(np.float64), T).astype(np.float32)
    inr = (
        (ref[:, 0] > lr[0]) & (ref[:, 0] < lr[3])
        & (ref[:, 1] > lr[1]) & (ref[:, 1] < lr[4])
        & (ref[:, 2] > lr[2]) & (ref[:, 2] < lr[5])
    )
    ref = ref[inr]
    assert n == len(ref)
    np.testing.assert_allclose(out[:n], ref, atol=1e-4)


def test_native_ascii(tmp_path, rng, built):
    pts = rng.uniform(-5, 5, (40, 4)).astype(np.float32)
    p = tmp_path / "c.pcd"
    write_pcd(str(p), pts, binary=False)
    out = np.zeros((50, 4), np.float32)
    n = native.load_pcd_into(str(p), out)
    assert n == 40
    np.testing.assert_allclose(out[:n], pts, atol=1e-4)


def test_capacity_cap(tmp_path, rng, built):
    pts = rng.uniform(-5, 5, (100, 4)).astype(np.float32)
    p = tmp_path / "d.pcd"
    write_pcd(str(p), pts)
    out = np.zeros((30, 4), np.float32)
    n = native.load_pcd_into(str(p), out)
    assert n == 30
