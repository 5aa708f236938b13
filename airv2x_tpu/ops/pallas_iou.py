"""Pallas TPU kernel for the pairwise rotated-quad IoU matrix.

The XLA implementation (ops.rotated_iou.pairwise_quad_iou) materializes
every intermediate of the 24-candidate construction in HBM — ~10 GB of
traffic for a 1024x1024 matrix (~76 ms on v5e). This kernel tiles the pair
matrix into (TI, TJ) blocks and computes each pair's intersection area
with a SORT-FREE edge-integral formulation (see ``_iou_tile_body``):
every temporary is a plain (TI, TJ) 2-D f32 array, so the whole tile
stays in VMEM with no candidate axis, no angular sort, and no rolls.

History: the first kernel generation built the classic 24-candidate
intersection polygon and ordered it with a roll-based bitonic network on
a 32-wide sublane axis; the sort was ~90% of its runtime. The
edge-integral rewrite is ~3.8x faster (0.96 ms vs 3.63 at 512x512
triangular, 1.50 vs 6.53 at 1024x1024) and numerically tighter (max
|err| vs the f64 reference ~2e-5 at 140 m BEV offsets, ~1e-6 near the
origin; tests/test_pallas_iou.py verifies interpret mode at 2e-5).

Mosaic constraints that shaped this kernel (this toolchain):
  * ANY i1 (boolean) intermediate in a composed kernel fails Mosaic
    legalization with "Unsupported target bitwidth for truncation"
    (arith.trunci) — every predicate is float {0,1} arithmetic via
    ``_ge0`` and selects are lerps;
  * strided in-kernel slices of a (T, 4, 2) ref (``ref[:, k, 0]``) and
    direct (TI, 1) x (1, TJ) broadcast arithmetic both blow up the
    register allocator into hundreds of MB of spill slots and OOM the
    compiler at 128 MB VMEM — inputs therefore arrive pre-flattened as
    (TI, 8) / (8, TJ) lane-contiguous strips and are explicitly
    ``broadcast_to`` (TI, TJ) before any mixed arithmetic.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-8  # division guards
# Tolerance on cross-product terms (units length², scaled per pair by the
# larger quad area in _iou_tile_body): classifies half-plane constraints
# as entering/leaving/parallel and detects boundary-collinear pieces.
# Coordinates are pair-centered before any cross product, so f32 rounding
# stays well below this at every BEV range.
_TOL = 1e-4
_BIG = 1e9


def _ge0(x):
    """Float {0,1} mask for x >= 0 with NO boolean tensors: Mosaic in this
    image fails composed kernels containing i1 intermediates with
    "Unsupported target bitwidth for truncation" (arith.trunci), so every
    predicate is arithmetic."""
    return jnp.minimum(jnp.sign(x) + 1.0, 1.0)


def _iou_tile_kernel(q1_ref, q2_ref, out_ref, *, triangular: bool = False):
    """One (TI, TJ) tile of the pair matrix.

    ``triangular=True`` skips tiles that lie entirely in the strict lower
    triangle of the global matrix (row rank >= every column rank in the
    tile): greedy NMS only ever reads iou[i, j] where i outranks j
    (``earlier`` mask in ops/nms.py), so those tiles can be zero-filled
    without touching the result. At 512x512 with (64, 128) tiles this
    skips 12 of 32 tiles (37.5% of the kernel work).
    """
    if triangular:
        ti, tj = out_ref.shape
        row0 = pl.program_id(0) * ti
        col_end = (pl.program_id(1) + 1) * tj
        skip = row0 >= col_end  # every (i, j) in the tile has i > j

        @pl.when(skip)
        def _zero():
            out_ref[:, :] = jnp.zeros_like(out_ref)

        @pl.when(jnp.logical_not(skip))
        def _full():
            _iou_tile_body(q1_ref, q2_ref, out_ref)
    else:
        _iou_tile_body(q1_ref, q2_ref, out_ref)


def _iou_tile_body(q1_ref, q2_ref, out_ref):
    """Sort-free edge-integral intersection area (Green's theorem).

    area(A ∩ B) = Σ over directed edges of A clipped to inside(B) of the
    segment integral ½·cross(p, q)·Δt, plus the symmetric sum for B's
    edges inside A. Along a segment p + t·(q − p) the integrand of
    ½(x dy − y dx) is the CONSTANT ½·cross(p, q), so each piece is one
    parametric clip of t ∈ [0, 1] against the other quad's 4 half-planes
    — no intersection-vertex construction and no angular sort. Pieces
    exactly collinear with a half-plane boundary get weight ½, which makes
    both degenerate families exact: identical quads (same-direction
    boundary counted once per polygon → ½ + ½ = 1) and side-by-side quads
    sharing an edge (opposite-direction traversals cancel → 0).

    Everything is (TI, TJ) 2-D f32 with unrolled 4×4 half-plane loops:
    no middle axes, no rolls, no bitonic network — the sort of the old
    24-candidate construction was ~90% of the kernel time. Coordinates
    are centered per row pair at A's first corner so the cross terms are
    local-scale (the num/den terms are translation-invariant differences);
    without centering, f32 rounding at BEV ranges (~140 m) would swamp the
    collinearity tolerance.
    """
    # Corner layout: rows arrive FLAT as (TI, 8) [x0 y0 x1 y1 ...] and cols
    # as (8, TJ), so every in-kernel slice is a contiguous lane/sublane
    # strip and every broadcast is a native lane/sublane replication.
    # (Slicing a (T, 4, 2) ref at [:, k, 0] — a strided sublane gather —
    # or multiplying (TI, 1) by (1, TJ) directly sends Mosaic's register
    # allocator into hundreds of MB of spill slots; both OOM the compiler.)
    ti = q1_ref.shape[0]
    tj = q2_ref.shape[1]

    def bc(v):
        return jnp.broadcast_to(v, (ti, tj))

    x1 = [bc(q1_ref[:, 2 * k : 2 * k + 1]) for k in range(4)]
    y1 = [bc(q1_ref[:, 2 * k + 1 : 2 * k + 2]) for k in range(4)]
    x2 = [bc(q2_ref[2 * k : 2 * k + 1, :]) for k in range(4)]
    y2 = [bc(q2_ref[2 * k + 1 : 2 * k + 2, :]) for k in range(4)]

    # center every pair at A's first corner: num/den below are pure
    # coordinate differences (translation-invariant), but the edge
    # integrals ½·cross(p, q) are not — centered they stay local-scale
    ox, oy = x1[0], y1[0]
    xa = [v - ox for v in x1]
    ya = [v - oy for v in y1]
    xb = [v - ox for v in x2]
    yb = [v - oy for v in y2]

    def signed_area(xs, ys):
        s = None
        for k in range(4):
            kk = (k + 1) % 4
            t = xs[k] * ys[kk] - xs[kk] * ys[k]
            s = t if s is None else s + t
        return 0.5 * s

    sa = signed_area(xa, ya)  # (TI, TJ), constant along lanes
    sb = signed_area(xb, yb)  # (TI, TJ)
    sgn_a = jnp.sign(sa)
    sgn_b = jnp.sign(sb)
    aa = jnp.abs(sa)
    ab = jnp.abs(sb)
    # tolerance on cross-product terms (units: length²), scaled to the pair
    tol2 = _TOL * (jnp.maximum(aa, ab) + 1.0)

    def pieces(xs_p, ys_p, xs_h, ys_h, sgn_h):
        """Σ over edges of polygon P of ½·cross·Δt·w clipped to inside H.

        xs_p/ys_p: P's 4 corners; xs_h/ys_h: H's 4 corners; sgn_h: H's
        orientation sign. All centered; every term broadcasts to (TI, TJ).
        """
        total = None
        for e in range(4):
            px, py = xs_p[e], ys_p[e]
            qx, qy = xs_p[(e + 1) % 4], ys_p[(e + 1) % 4]
            dx, dy = qx - px, qy - py
            cross_e = px * qy - py * qx
            tlo = thi = emp = coll = None
            for k in range(4):
                b0x, b0y = xs_h[k], ys_h[k]
                ex = xs_h[(k + 1) % 4] - b0x
                ey = ys_h[(k + 1) % 4] - b0y
                num = sgn_h * (ex * (py - b0y) - ey * (px - b0x))
                den = sgn_h * (ex * dy - ey * dx)
                gt = _ge0(den - tol2)  # den > tol2: entering constraint
                lt = _ge0(-den - tol2)  # den < -tol2: leaving constraint
                mid = (1.0 - gt) * (1.0 - lt)  # |den| <= tol2: parallel
                tb = -num / (den + mid)  # mid -> denominator ~1, unused
                tlo_k = gt * tb + (1.0 - gt) * (-_BIG)
                thi_k = lt * tb + (1.0 - lt) * _BIG
                emp_k = mid * _ge0(-num - tol2)  # parallel & outside
                coll_k = mid * _ge0(tol2 - jnp.abs(num))  # on the boundary
                if tlo is None:
                    tlo, thi, emp, coll = tlo_k, thi_k, emp_k, coll_k
                else:
                    tlo = jnp.maximum(tlo, tlo_k)
                    thi = jnp.minimum(thi, thi_k)
                    emp = jnp.maximum(emp, emp_k)
                    coll = jnp.maximum(coll, coll_k)
            t0 = jnp.maximum(tlo, 0.0)
            t1 = jnp.minimum(thi, 1.0)
            dt = jnp.maximum(t1 - t0, 0.0) * (1.0 - emp)
            w = 1.0 - 0.5 * coll
            contrib = cross_e * (dt * w)
            total = contrib if total is None else total + contrib
        return total

    inter = 0.5 * jnp.abs(
        pieces(xa, ya, xb, yb, sgn_b) * sgn_a
        + pieces(xb, yb, xa, ya, sgn_a) * sgn_b
    )
    union = aa + ab - inter
    out_ref[:, :] = inter / jnp.maximum(union, _EPS)


@partial(jax.jit, static_argnames=("tile_i", "tile_j", "triangular"))
def pairwise_quad_iou_pallas(
    c1: jnp.ndarray,
    c2: jnp.ndarray,
    tile_i: int = 64,
    tile_j: int = 128,
    triangular: bool = False,
) -> jnp.ndarray:
    """(N, 4, 2) x (M, 4, 2) -> (N, M) IoU via the fused VMEM kernel.

    N and M must be multiples of the tile sizes (the NMS path pads to a
    power-of-two top_k, which satisfies this). With ``triangular=True``
    only the strict upper triangle i < j is guaranteed (lower-triangle
    tiles are zero-filled) — valid when the caller only reads pairs where
    the row outranks the column, as greedy NMS does.
    """
    n, m = c1.shape[0], c2.shape[0]
    assert n % tile_i == 0 and m % tile_j == 0, (n, m, tile_i, tile_j)
    grid = (n // tile_i, m // tile_j)
    return _call(c1, c2, grid, tile_i, tile_j, interpret=False,
                 triangular=triangular)


def pairwise_quad_iou_interpret(c1, c2, tile_i: int = 128, tile_j: int = 128,
                                triangular: bool = False):
    """Interpreter-mode execution (used by the semantics tests)."""
    n, m = c1.shape[0], c2.shape[0]
    grid = (n // tile_i, m // tile_j)
    return _call(c1, c2, grid, tile_i, tile_j, interpret=True,
                 triangular=triangular)


_FUSED_OK: bool | None = None


def pairwise_quad_iou_fused(c1, c2, triangular: bool = False):
    """Pallas kernel with one-time probe + XLA fallback (see STATUS above).

    The probe must NOT run while tracing an outer jit (tracer inputs): an
    inner jit call is inlined there, so a backend that cannot lower the
    kernel would not raise until the *outer* lowering — long after the
    except. Inside a trace the decision falls back to the backend platform.
    """
    global _FUSED_OK
    if _FUSED_OK is None:
        if jax.default_backend() != "tpu":
            _FUSED_OK = False
        elif not isinstance(c1, jax.core.Tracer):
            try:
                small = jnp.zeros((128, 4, 2), jnp.float32)
                jax.block_until_ready(pairwise_quad_iou_pallas(small, small))
                _FUSED_OK = True
            except Exception:
                _FUSED_OK = False
        # else: tracing on TPU before any probe — use the platform answer
        # for this call without caching, so a later eager call still probes.
    use = _FUSED_OK
    if use is None:
        use = jax.default_backend() == "tpu"
    if use and c1.shape[0] % 64 == 0 and c2.shape[0] % 128 == 0:
        return pairwise_quad_iou_pallas(c1, c2, triangular=triangular)
    from airv2x_tpu.ops.rotated_iou import pairwise_quad_iou

    # XLA fallback computes the full matrix; a superset of the triangular
    # contract, so callers that only read i < j are unaffected.
    return pairwise_quad_iou(c1, c2)


def _call(c1, c2, grid, tile_i, tile_j, interpret, triangular=False):
    n, m = c1.shape[0], c2.shape[0]
    # flatten corners OUTSIDE the kernel: rows (N, 8), cols (8, M) — see the
    # layout note in _iou_tile_body (in-kernel strided slices OOM Mosaic)
    c1f = c1.astype(jnp.float32).reshape(n, 8)
    c2f = c2.astype(jnp.float32).reshape(m, 8).T
    return pl.pallas_call(
        partial(_iou_tile_kernel, triangular=triangular),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_i, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (8, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_i, tile_j), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(c1f, c2f)
