"""Pallas IoU kernel semantics (interpret mode) + fallback wrapper."""

import jax.numpy as jnp
import numpy as np

from airv2x_tpu.ops import geometry as geo
from airv2x_tpu.ops.pallas_iou import (
    pairwise_quad_iou_fused,
    pairwise_quad_iou_interpret,
)
from airv2x_tpu.ops.rotated_iou import pairwise_quad_iou


def _quads(rng, n):
    boxes = np.stack(
        [
            rng.uniform(-60, 60, n),
            rng.uniform(-30, 30, n),
            np.zeros(n),
            np.full(n, 1.56),
            np.full(n, 1.6),
            np.full(n, 3.9),
            rng.uniform(-np.pi, np.pi, n),
        ],
        axis=-1,
    ).astype(np.float32)
    return geo.boxes_to_corners_bev(jnp.asarray(boxes), order="hwl")


def test_kernel_semantics_match_xla(rng):
    qs = _quads(rng, 128)
    ref = np.asarray(pairwise_quad_iou(qs, qs))
    pal = np.asarray(pairwise_quad_iou_interpret(qs, qs))
    err = np.abs(ref - pal)
    assert err.max() < 1e-3, err.max()
    # identical-pair diagonal must be exactly ~1
    np.testing.assert_allclose(np.diag(pal), 1.0, atol=1e-4)


def test_triangular_mode_upper_triangle_exact(rng):
    # NMS contract: with triangular=True every pair i < j matches the full
    # kernel; fully-lower tiles may be zero-filled. Tile (64, 64) over a
    # 256-candidate list exercises skipped, diagonal and mixed tiles.
    qs = _quads(rng, 256)
    full = np.asarray(pairwise_quad_iou_interpret(qs, qs, 64, 64))
    tri = np.asarray(
        pairwise_quad_iou_interpret(qs, qs, 64, 64, triangular=True)
    )
    iu = np.triu_indices(256, k=1)
    # pl.when wrapping may reassociate fp slightly vs the unwrapped kernel
    np.testing.assert_allclose(tri[iu], full[iu], atol=1e-5)
    # tiles strictly below the block diagonal are zero-filled
    r, c = np.indices(tri.shape)
    assert np.all(tri[(r // 64) > (c // 64)] == 0)


def test_fused_wrapper_falls_back(rng):
    # whatever the backend supports, the wrapper must return correct values
    qs = _quads(rng, 128)
    ref = np.asarray(pairwise_quad_iou(qs, qs))
    out = np.asarray(pairwise_quad_iou_fused(qs, qs))
    assert np.abs(ref - out).max() < 1e-3
