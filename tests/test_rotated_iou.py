import jax.numpy as jnp
import numpy as np
import pytest

from airv2x_tpu.ops import geometry as geo
from airv2x_tpu.ops.rotated_iou import (
    elementwise_quad_iou,
    pairwise_quad_iou,
    polygon_area,
    quad_intersection_area,
)


def _quad(cx, cy, w, l, yaw):
    box = jnp.array([[cx, cy, 0.0, 1.0, w, l, yaw]])
    return geo.boxes_to_corners_bev(box, order="hwl")[0]


# ---- host reference: Sutherland–Hodgman clipping (independent algorithm) ----
def _clip_poly_np(subject, clip):
    def inside(p, a, b):
        return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) >= -1e-12

    def intersect(p1, p2, a, b):
        d1 = p2 - p1
        d2 = b - a
        denom = d1[0] * d2[1] - d1[1] * d2[0]
        t = ((a[0] - p1[0]) * d2[1] - (a[1] - p1[1]) * d2[0]) / denom
        return p1 + t * d1

    # ensure CCW clip polygon
    if polygon_signed_area_np(clip) < 0:
        clip = clip[::-1]
    output = list(subject)
    for i in range(len(clip)):
        a, b = clip[i], clip[(i + 1) % len(clip)]
        input_list, output = output, []
        if not input_list:
            break
        s = input_list[-1]
        for e in input_list:
            if inside(e, a, b):
                if not inside(s, a, b):
                    output.append(intersect(s, e, a, b))
                output.append(e)
            elif inside(s, a, b):
                output.append(intersect(s, e, a, b))
            s = e
    return np.array(output) if output else np.zeros((0, 2))


def polygon_signed_area_np(poly):
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)


def _iou_np(q1, q2):
    q1, q2 = np.asarray(q1, np.float64), np.asarray(q2, np.float64)
    inter_poly = _clip_poly_np(q1, q2)
    inter = abs(polygon_signed_area_np(inter_poly)) if len(inter_poly) >= 3 else 0.0
    a1 = abs(polygon_signed_area_np(q1))
    a2 = abs(polygon_signed_area_np(q2))
    return inter / (a1 + a2 - inter)


def test_identical_boxes():
    q = _quad(0, 0, 2, 4, 0.3)
    iou = float(elementwise_quad_iou(q, q))
    assert iou == pytest.approx(1.0, abs=1e-5)


def test_disjoint_boxes():
    q1 = _quad(0, 0, 2, 4, 0.0)
    q2 = _quad(100, 0, 2, 4, 1.0)
    assert float(elementwise_quad_iou(q1, q2)) == 0.0


def test_half_overlap_axis_aligned():
    q1 = _quad(0, 0, 2, 4, 0.0)  # x in [-2,2], y in [-1,1]
    q2 = _quad(2, 0, 2, 4, 0.0)  # x in [0,4]
    # inter = 2*2=4, union = 8+8-4=12
    assert float(elementwise_quad_iou(q1, q2)) == pytest.approx(4 / 12, abs=1e-5)


def test_rotated_45_cross():
    # unit squares, one rotated 45 deg, same center: classic iou = 2(sqrt2-1)/(2-(2)(sqrt2-1))
    q1 = _quad(0, 0, 1, 1, 0.0)
    q2 = _quad(0, 0, 1, 1, np.pi / 4)
    inter = 4 * (np.sqrt(2) - 1) / 2  # octagon area = 2*(sqrt(2)-1)... compute via np ref
    expected = _iou_np(np.asarray(q1), np.asarray(q2))
    assert float(elementwise_quad_iou(q1, q2)) == pytest.approx(expected, abs=1e-5)


def test_containment():
    q1 = _quad(0, 0, 4, 4, 0.2)
    q2 = _quad(0, 0, 2, 2, 0.2)
    # fully contained: iou = area2/area1 = 4/16
    assert float(elementwise_quad_iou(q1, q2)) == pytest.approx(0.25, abs=1e-5)


def test_random_pairs_match_host_clipper(rng):
    n = 64
    boxes = np.stack(
        [
            rng.uniform(-5, 5, n),
            rng.uniform(-5, 5, n),
            np.zeros(n),
            np.ones(n),
            rng.uniform(0.5, 3, n),
            rng.uniform(0.5, 5, n),
            rng.uniform(-np.pi, np.pi, n),
        ],
        axis=-1,
    ).astype(np.float32)
    quads = np.asarray(geo.boxes_to_corners_bev(jnp.asarray(boxes), order="hwl"))
    iou_dev = np.asarray(pairwise_quad_iou(jnp.asarray(quads), jnp.asarray(quads)))
    # spot check 200 random pairs against the host clipper
    idx = rng.integers(0, n, size=(200, 2))
    for i, j in idx:
        expected = _iou_np(quads[i], quads[j])
        assert iou_dev[i, j] == pytest.approx(expected, abs=2e-4), (i, j)


def test_pairwise_shape_and_symmetry(rng):
    b1 = np.asarray(_quad(0, 0, 2, 4, 0.1))[None]
    b2 = np.stack([np.asarray(_quad(1, 0, 2, 4, 0.4)), np.asarray(_quad(9, 9, 1, 1, 0))])
    m = np.asarray(pairwise_quad_iou(jnp.asarray(b1), jnp.asarray(b2)))
    assert m.shape == (1, 2)
    mt = np.asarray(pairwise_quad_iou(jnp.asarray(b2), jnp.asarray(b1)))
    np.testing.assert_allclose(m, mt.T, atol=1e-6)


def test_polygon_area():
    sq = jnp.array([[0.0, 0], [1, 0], [1, 1], [0, 1]])
    assert float(polygon_area(sq)) == pytest.approx(1.0)


def test_degenerate_touching_edges():
    q1 = _quad(0, 0, 2, 2, 0.0)
    q2 = _quad(2, 0, 2, 2, 0.0)  # share an edge, zero-area intersection
    iou = float(elementwise_quad_iou(q1, q2))
    assert iou == pytest.approx(0.0, abs=1e-4)
