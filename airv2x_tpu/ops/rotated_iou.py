"""Rotated (convex-quad) BEV IoU, fully vectorized and jit-compatible.

Replaces three native components of the reference with one XLA program:
  * shapely polygon IoU used by rotated NMS + AP eval
    (box_utils.nms_rotated box_utils.py:823-868, common_utils.compute_iou
    common_utils.py:150-193) — CPU-bound hot path of inference;
  * the CUDA rotated-IoU kernels (pcdet_utils/iou3d_nms/src/*.cu);
  * the ``sort_vertices`` CUDA op (utils/cuda_op/sort_vert_kernel.cu).

Algorithm (the standard convex-intersection construction, chosen because it
vectorizes with *no* data-dependent control flow — ideal for the VPU):
the intersection of two convex quads has at most 8 vertices, each of which is
either (a) one of the 16 pairwise edge-edge intersection points or (b) a
corner of one quad inside the other. We gather all 24 candidates with a
validity mask, sort valid ones by angle around their centroid, pad by
repeating the last valid vertex (repeats contribute zero to the shoelace sum),
and evaluate the shoelace formula.

Exactness: for quads in general position this is exact; degenerate contacts
(shared edges/vertices) resolve within float tolerance, matching shapely to
~1e-6 relative (see tests/test_rotated_iou.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8
_TOL_M = 1e-4  # boundary tolerance for corner-inside tests, in meters
_NUM_CAND = 24  # 16 edge-edge + 4 + 4 corner-inside candidates


def polygon_area(corners: jnp.ndarray) -> jnp.ndarray:
    """Shoelace |area| of (..., K, 2) polygons with wraparound."""
    x, y = corners[..., 0], corners[..., 1]
    xn, yn = jnp.roll(x, -1, axis=-1), jnp.roll(y, -1, axis=-1)
    return 0.5 * jnp.abs(jnp.sum(x * yn - xn * y, axis=-1))


def _points_in_quad(points: jnp.ndarray, quad: jnp.ndarray) -> jnp.ndarray:
    """(..., P, 2) points inside (..., 4, 2) convex quad (either winding).

    Boundary tolerance is METRIC (a signed distance of ``_TOL_M`` meters),
    not an absolute epsilon on the cross product: cross = dist * |edge|, and
    at BEV coordinates ~O(10) m the f32 rounding of the cross product alone
    is ~1e-6 — under jit, FMA fusion leaves exactly that residual for a
    corner lying on its own quad's edge, so an absolute 1e-8 epsilon made
    IDENTICAL quads fail the corner-inside test (IoU 1.0 eagerly, ~0
    jitted — caught by tools/debug_utils' label round trip).
    """
    a = quad  # (..., 4, 2)
    b = jnp.roll(quad, -1, axis=-2)
    edge = b - a  # (..., 4, 2)
    # cross(edge_k, p - a_k) for all points and edges -> (..., P, 4)
    rel = points[..., :, None, :] - a[..., None, :, :]  # (..., P, 4, 2)
    cross = edge[..., None, :, 0] * rel[..., 1] - edge[..., None, :, 1] * rel[..., 0]
    lim = _TOL_M * jnp.linalg.norm(edge, axis=-1)[..., None, :]  # (..., 1, 4)
    inside_ccw = jnp.all(cross >= -lim, axis=-1)
    inside_cw = jnp.all(cross <= lim, axis=-1)
    return inside_ccw | inside_cw


def _edge_intersections(q1: jnp.ndarray, q2: jnp.ndarray):
    """All 16 intersection points of quad-edge pairs.

    Returns (points (..., 16, 2), valid (..., 16)).
    """
    a = q1  # (..., 4, 2)
    b = jnp.roll(q1, -1, axis=-2)
    c = q2
    d = jnp.roll(q2, -1, axis=-2)

    # Broadcast edge pairs: i over q1 edges, j over q2 edges.
    a = a[..., :, None, :]  # (..., 4, 1, 2)
    b = b[..., :, None, :]
    c = c[..., None, :, :]  # (..., 1, 4, 2)
    d = d[..., None, :, :]

    r = b - a
    s = d - c
    denom = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]  # (..., 4, 4)
    qp = c - a
    t_num = qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]
    u_num = qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]

    safe = jnp.where(jnp.abs(denom) > _EPS, denom, 1.0)
    t = t_num / safe
    u = u_num / safe
    valid = (
        (jnp.abs(denom) > _EPS)
        & (t >= -_EPS)
        & (t <= 1.0 + _EPS)
        & (u >= -_EPS)
        & (u <= 1.0 + _EPS)
    )
    pts = a + t[..., None] * r  # (..., 4, 4, 2)
    shp = pts.shape[:-3] + (16, 2)
    return pts.reshape(shp), valid.reshape(valid.shape[:-2] + (16,))


_SORT_N = 32  # candidates padded to a power of two for the bitonic network
_BIG = 1e9


def _bitonic_sort_by_key(keys: jnp.ndarray, pts: jnp.ndarray):
    """Ascending sort of (..., N) keys carrying (..., N, 2) points.

    A static bitonic network: every stage is an elementwise min/max against a
    *statically* permuted partner lane — no data-dependent gathers. On TPU
    this replaces an argsort + two take_along_axis (which lowered to ~1 ms
    per 1k pairs, see bench history) with pure VPU ops.
    """
    import numpy as _np

    n = keys.shape[-1]
    assert n & (n - 1) == 0, "bitonic size must be a power of two"
    idx = _np.arange(n)
    batch = keys.shape[:-1]

    def partner_swap(a, j, extra_dims):
        # partner lane = idx XOR j == flip of the pair axis after reshaping
        # lanes into (groups, 2, j): a static reshape + reverse, no gather.
        shp = a.shape
        g = n // (2 * j)
        a = a.reshape(batch + (g, 2, j) + shp[len(batch) + 1 :])
        a = jnp.flip(a, axis=len(batch) + 1)
        return a.reshape(shp)

    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            kp = partner_swap(keys, j, 0)
            pp = partner_swap(pts, j, 1)
            lower = (idx & j) == 0
            ascend = (idx & k) == 0
            take_min = jnp.asarray(lower == ascend)  # static (n,) bool
            take_self = jnp.where(take_min, keys <= kp, keys >= kp)
            keys = jnp.where(take_min, jnp.minimum(keys, kp), jnp.maximum(keys, kp))
            pts = jnp.where(take_self[..., None], pts, pp)
            j //= 2
        k *= 2
    return keys, pts


def quad_intersection_area(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of two convex quads, (..., 4, 2) x (..., 4, 2) -> (...,)."""
    batch = jnp.broadcast_shapes(q1.shape[:-2], q2.shape[:-2])
    q1 = jnp.broadcast_to(q1, batch + q1.shape[-2:])
    q2 = jnp.broadcast_to(q2, batch + q2.shape[-2:])
    inter_pts, inter_valid = _edge_intersections(q1, q2)
    in12 = _points_in_quad(q1, q2)  # q1 corners inside q2, (..., 4)
    in21 = _points_in_quad(q2, q1)

    cand = jnp.concatenate([inter_pts, q1, q2], axis=-2)  # (..., 24, 2)
    valid = jnp.concatenate([inter_valid, in12, in21], axis=-1)  # (..., 24)

    num_valid = jnp.sum(valid, axis=-1)
    # Centroid of valid candidates.
    denom = jnp.maximum(num_valid, 1)[..., None]
    centroid = jnp.sum(jnp.where(valid[..., None], cand, 0.0), axis=-2) / denom
    rel = jnp.where(valid[..., None], cand - centroid[..., None, :], 0.0)

    ang = jnp.arctan2(rel[..., 1], rel[..., 0])
    ang = jnp.where(valid, ang, _BIG)  # invalid sort to the end

    pad = _SORT_N - _NUM_CAND
    ang = jnp.concatenate(
        [ang, jnp.full(batch + (pad,), _BIG, ang.dtype)], axis=-1
    )
    rel = jnp.concatenate(
        [rel, jnp.zeros(batch + (pad, 2), rel.dtype)], axis=-2
    )
    ang_s, rel_s = _bitonic_sort_by_key(ang, rel)

    # Replace the invalid tail with the FIRST vertex: the closing edge
    # v_{k-1} -> v_0 is then the real one and every duplicated v_0 edge
    # contributes zero to the shoelace sum — no gather needed.
    valid_s = ang_s < _BIG / 2
    first = rel_s[..., :1, :]
    poly = jnp.where(valid_s[..., None], rel_s, first)

    area = polygon_area(poly)
    return jnp.where(num_valid >= 3, area, 0.0)


def pairwise_quad_iou(c1: jnp.ndarray, c2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of BEV quads: (N, 4, 2) x (M, 4, 2) -> (N, M)."""
    inter = quad_intersection_area(c1[:, None], c2[None, :])
    a1 = polygon_area(c1)
    a2 = polygon_area(c2)
    union = a1[:, None] + a2[None, :] - inter
    return inter / jnp.maximum(union, _EPS)


def elementwise_quad_iou(c1: jnp.ndarray, c2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of aligned batches: (..., 4, 2) x (..., 4, 2) -> (...,)."""
    inter = quad_intersection_area(c1, c2)
    union = polygon_area(c1) + polygon_area(c2) - inter
    return inter / jnp.maximum(union, _EPS)


def rotated_iou_matrix_np(corners1, corners2):
    """Host (numpy) twin used by the eval harness; delegates to the XLA op on
    whatever backend is active so eval matches NMS bit-for-bit."""
    import numpy as np

    if corners1.shape[0] == 0 or corners2.shape[0] == 0:
        return np.zeros((corners1.shape[0], corners2.shape[0]), dtype=np.float32)
    out = jax.jit(pairwise_quad_iou)(
        jnp.asarray(corners1, jnp.float32), jnp.asarray(corners2, jnp.float32)
    )
    return np.asarray(out)
