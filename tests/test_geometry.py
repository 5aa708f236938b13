import jax.numpy as jnp
import numpy as np

from airv2x_tpu.ops import geometry as geo


def test_axis_aligned_box_corners():
    # hwl box: h=2, w=4, l=6 centered at origin, yaw 0.
    box = jnp.array([[0.0, 0.0, 0.0, 2.0, 4.0, 6.0, 0.0]])
    c = np.asarray(geo.boxes_to_corners_3d(box, order="hwl"))[0]
    # l along x (±3), w along y (±2), h along z (±1)
    assert np.allclose(sorted(set(np.round(c[:, 0], 6))), [-3, 3])
    assert np.allclose(sorted(set(np.round(c[:, 1], 6))), [-2, 2])
    assert np.allclose(sorted(set(np.round(c[:, 2], 6))), [-1, 1])
    # corner layout: 0-3 bottom, 4-7 top, k+4 above k
    assert np.all(c[:4, 2] == -1) and np.all(c[4:, 2] == 1)
    np.testing.assert_allclose(c[:4, :2], c[4:, :2])


def test_corner_order_matches_reference_template():
    box = jnp.array([[0.0, 0.0, 0.0, 2.0, 4.0, 6.0, 0.0]])
    c = np.asarray(geo.boxes_to_corners_3d(box, order="hwl"))[0]
    expected = (
        np.array(
            [
                [1, -1, -1],
                [1, 1, -1],
                [-1, 1, -1],
                [-1, -1, -1],
                [1, -1, 1],
                [1, 1, 1],
                [-1, 1, 1],
                [-1, -1, 1],
            ],
            dtype=np.float64,
        )
        / 2
        * np.array([6, 4, 2])
    )
    np.testing.assert_allclose(c, expected, atol=1e-6)


def test_corner_center_roundtrip(rng):
    boxes = np.stack(
        [
            rng.uniform(-50, 50, 16),
            rng.uniform(-20, 20, 16),
            rng.uniform(-3, 1, 16),
            rng.uniform(1, 3, 16),  # h
            rng.uniform(1, 3, 16),  # w
            rng.uniform(2, 6, 16),  # l
            rng.uniform(-np.pi / 2 + 0.01, np.pi / 2 - 0.01, 16),
        ],
        axis=-1,
    ).astype(np.float32)
    corners = geo.boxes_to_corners_3d(jnp.asarray(boxes), order="hwl")
    back = np.asarray(geo.corner_to_center(corners, order="hwl"))
    np.testing.assert_allclose(back, boxes, atol=1e-3)


def test_project_corners_rigid(rng):
    from airv2x_tpu.utils import transforms as tf

    boxes = jnp.array([[1.0, 2.0, 0.0, 2.0, 2.0, 4.0, 0.3]])
    corners = geo.boxes_to_corners_3d(boxes, order="hwl")
    T = jnp.asarray(tf.pose_to_world(rng.uniform(-10, 10, 6)), jnp.float32)
    proj = np.asarray(geo.project_corners(corners, T))
    # volume-preserving: edge lengths unchanged
    c = np.asarray(corners)[0]
    p = proj[0]
    for i, j in [(0, 1), (1, 2), (0, 4)]:
        np.testing.assert_allclose(
            np.linalg.norm(c[i] - c[j]), np.linalg.norm(p[i] - p[j]), rtol=1e-4
        )


def test_aligned_iou_matches_fastrcnn_convention():
    # identical boxes -> 1, disjoint with >=1 gap handled by +1 convention
    b1 = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b2 = jnp.array([[0.0, 0.0, 10.0, 10.0], [20.0, 20.0, 30.0, 30.0]])
    iou = np.asarray(geo.aligned_iou_2d(b1, b2))
    assert np.isclose(iou[0, 0], 1.0)
    assert iou[0, 1] == 0.0
    # the legacy +1 pixel convention: overlap of [0,10]x[0,10] and [5,5..15,15]
    b3 = jnp.array([[5.0, 5.0, 15.0, 15.0]])
    expected_inter = (10 - 5 + 1) ** 2
    expected_union = 11**2 + 11**2 - expected_inter
    np.testing.assert_allclose(
        np.asarray(geo.aligned_iou_2d(b1, b3))[0, 0],
        expected_inter / expected_union,
        rtol=1e-6,
    )


def test_mask_boxes_in_range():
    boxes = jnp.array(
        [
            [0.0, 0.0, 0.0, 2.0, 2.0, 4.0, 0.0],
            [200.0, 0.0, 0.0, 2.0, 2.0, 4.0, 0.0],
        ]
    )
    corners = geo.boxes_to_corners_3d(boxes, order="hwl")
    mask = np.asarray(
        geo.mask_boxes_in_range_bev(corners, [-140.8, -40, -3, 140.8, 40, 1])
    )
    assert mask.tolist() == [True, False]


def test_keep_reasonable_boxes():
    boxes = jnp.array(
        [
            [0.0, 0.0, 0.0, 2.0, 2.0, 4.0, 0.0],  # fine (z in [-1, 1])
            [0.0, 0.0, 0.0, 2.0, 9.0, 9.0, 0.0],  # too large
            [0.0, 0.0, 40.0, 2.0, 2.0, 4.0, 0.0],  # abnormal z
        ]
    )
    corners = geo.boxes_to_corners_3d(boxes, order="hwl")
    mask = np.asarray(geo.keep_reasonable_boxes(corners, z_min=-3.0, z_max=1.0))
    assert mask.tolist() == [True, False, False]


def test_limit_period():
    vals = jnp.array([0.0, np.pi, -np.pi, 3 * np.pi, 0.5])
    out = np.asarray(geo.limit_period(vals))
    assert np.all(out >= -np.pi - 1e-6) and np.all(out < np.pi + 1e-6)
    np.testing.assert_allclose(out[4], 0.5)
