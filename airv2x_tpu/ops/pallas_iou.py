"""Pallas TPU kernel for the pairwise rotated-quad IoU matrix.

The XLA implementation (ops.rotated_iou.pairwise_quad_iou) materializes
every intermediate of the 24-candidate construction in HBM — ~10 GB of
traffic for a 1024x1024 matrix (~76 ms on v5e). This kernel tiles the pair
matrix into (TI, TJ) blocks and runs the whole pipeline — edge
intersections, containment tests, centroid, angle sort (roll-based bitonic
network, no gathers), shoelace — entirely in VMEM, so HBM sees only the two
corner lists in and the IoU tile out.

Layout: all per-pair temporaries are (TI, K, TJ) with the j-pair axis on
the 128-wide lane dimension and the candidate axis K on sublanes.

STATUS: compiles and runs on TPU v5e. Two Mosaic constraints shaped the
kernel: (1) ANY i1 (boolean) intermediate in the composed kernel fails
Mosaic legalization with "Unsupported target bitwidth for truncation"
(arith.trunci) — so every predicate is float {0,1} arithmetic via
``_ge0`` and selects are lerps; (2) the (TI, 32, TJ) f32 temporaries must
fit scoped VMEM (16 MB) — tile (64, 128) fits, (128, 128) does not.
Measured vs the XLA path on v5e: 4.35 ms vs 6.14 ms at 512x512,
6.53 ms vs 13.06 ms at 1024x1024 (scan-timed). Numerics: mean |err|
~3e-9, max ~4e-4 on boundary-touching pairs (tests/test_pallas_iou.py
verifies interpret mode at 2e-5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-8  # division guards
# Inclusion tolerance for intersection/containment tests: must sit above
# f32 rounding noise at BEV coordinate magnitudes (~100 m -> ~1e-5), or
# corner-touching candidates drop out and degenerate the polygon.
_TOL = 1e-4
_BIG = 1e9
_NC = 24  # candidate count
_NS = 32  # bitonic width


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
    ti = q1_ref.shape[0]
    tj = q2_ref.shape[0]

    # corner coordinates: i-side (TI, 4, 1), j-side (1, 4, TJ)
    x1 = q1_ref[:, :, 0][:, :, None]  # (TI, 4, 1)
    y1 = q1_ref[:, :, 1][:, :, None]
    x2 = jnp.transpose(q2_ref[:, :, 0])[None, :, :]  # (1, 4, TJ)
    y2 = jnp.transpose(q2_ref[:, :, 1])[None, :, :]

    def nxt(a, axis=1):
        # jnp.roll(a, -1) equivalent; pltpu.roll requires shift >= 0
        return pltpu.roll(a, a.shape[axis] - 1, axis)

    # ---- 16 edge-edge intersections ----
    ax, ay, bx, by = x1, y1, nxt(x1), nxt(y1)  # (TI, 4, 1)
    cx, cy, dx, dy = x2, y2, nxt(x2), nxt(y2)  # (1, 4, TJ)
    rx, ry = bx - ax, by - ay
    sx, sy = dx - cx, dy - cy

    # broadcast edge pairs to (TI, 4, 4, TJ): i-edge axis 1, j-edge axis 2
    def bi(a):  # (TI, 4, 1) -> (TI, 4, 1, 1)
        return a[:, :, None, :]

    def bj(a):  # (1, 4, TJ) -> (1, 1, 4, TJ)
        return a[:, None, :, :]

    denom = bi(rx) * bj(sy) - bi(ry) * bj(sx)  # (TI, 4, 4, TJ)
    qpx = bj(cx) - bi(ax)
    qpy = bj(cy) - bi(ay)
    t_num = qpx * bj(sy) - qpy * bj(sx)
    u_num = qpx * bi(ry) - qpy * bi(rx)
    nz = _ge0(jnp.abs(denom) - _EPS)  # float: |denom| > eps
    safe = denom + (1.0 - nz)  # nz==0 -> denom==~0 -> use 1.0
    t = t_num / safe
    u = u_num / safe
    iok_f = (
        nz
        * _ge0(t + _TOL) * _ge0(1.0 + _TOL - t)
        * _ge0(u + _TOL) * _ge0(1.0 + _TOL - u)
    )
    ix = bi(ax) + t * bi(rx)
    iy = bi(ay) + t * bi(ry)

    ix = ix.reshape(ti, 16, tj)
    iy = iy.reshape(ti, 16, tj)
    iok_f = iok_f.reshape(ti, 16, tj)

    # ---- corner containment ----
    def inside(px, py, qx, qy):
        # point (TI, P, TJ) in convex quad (corner arrays broadcast to
        # (TI?, 4, TJ?)); cross sign against all 4 edges consistent.
        ex, ey = nxt(qx) - qx, nxt(qy) - qy  # quad edges
        relx = px[:, :, None, :] - qx[:, None, :, :]
        rely = py[:, :, None, :] - qy[:, None, :, :]
        cr = ex[:, None, :, :] * rely - ey[:, None, :, :] * relx
        # unrolled 4-way min: Mosaic rejects middle-axis reductions of 4D
        ge = le = None
        for kk in range(4):
            g = _ge0(cr[:, :, kk, :] + _TOL * 100.0)
            l_ = _ge0(_TOL * 100.0 - cr[:, :, kk, :])
            ge = g if ge is None else jnp.minimum(ge, g)
            le = l_ if le is None else jnp.minimum(le, l_)
        return jnp.maximum(ge, le)  # float 0/1 mask

    # q1 corners in q2: points (TI, 4, 1) vs quad (1, 4, TJ)
    in12 = inside(
        jnp.broadcast_to(x1, (ti, 4, 1)),
        jnp.broadcast_to(y1, (ti, 4, 1)),
        jnp.broadcast_to(x2, (1, 4, tj)),
        jnp.broadcast_to(y2, (1, 4, tj)),
    )  # (TI, 4, TJ)
    in21 = inside(
        jnp.broadcast_to(x2, (1, 4, tj)),
        jnp.broadcast_to(y2, (1, 4, tj)),
        jnp.broadcast_to(x1, (ti, 4, 1)),
        jnp.broadcast_to(y1, (ti, 4, 1)),
    )
    in21 = jnp.broadcast_to(in21, (ti, 4, tj))  # float masks
    in12 = jnp.broadcast_to(in12, (ti, 4, tj))

    cx1 = jnp.broadcast_to(x1, (ti, 4, tj))
    cy1 = jnp.broadcast_to(y1, (ti, 4, tj))
    cx2 = jnp.broadcast_to(x2, (ti, 4, tj))
    cy2 = jnp.broadcast_to(y2, (ti, 4, tj))

    # assemble all candidates directly at the padded width of 32 sublanes
    # (24-sublane intermediates trip Mosaic's layout legalization)
    zpad = jnp.zeros((ti, _NS - _NC, tj), ix.dtype)
    candx = jnp.concatenate([ix, cx1, cx2, zpad], axis=1)  # (TI, 32, TJ)
    candy = jnp.concatenate([iy, cy1, cy2, zpad], axis=1)
    valid_f = jnp.concatenate([iok_f, in12, in21, zpad], axis=1)

    nvalid = jnp.sum(valid_f, axis=1)  # (TI, TJ)
    denomv = jnp.maximum(nvalid, 1.0)[:, None, :]
    mx = jnp.sum(valid_f * candx, axis=1, keepdims=True) / denomv
    my = jnp.sum(valid_f * candy, axis=1, keepdims=True) / denomv
    relx = valid_f * (candx - mx)
    rely = valid_f * (candy - my)
    # diamond pseudo-angle: monotonic in atan2 (which Pallas does not lower),
    # mapping the circle to [-2, 2) — the sort only needs the ordering.
    r = rely / (jnp.abs(relx) + jnp.abs(rely) + _EPS)
    mposx = _ge0(relx)
    mposy = _ge0(rely)
    pseudo = mposx * r + (1.0 - mposx) * (
        mposy * (2.0 - r) + (1.0 - mposy) * (-2.0 - r)
    )
    ang = valid_f * pseudo + (1.0 - valid_f) * _BIG

    # ---- bitonic sort by angle (flip-based partner exchange on axis 1) ----
    lane_f = jax.lax.broadcasted_iota(jnp.int32, (1, _NS, 1), 1).astype(
        jnp.float32
    )

    def bit_clear_f(m):
        # float {0,1}: 1 where the bit of weight m is clear in the lane id
        return 1.0 - jnp.mod(jnp.floor(lane_f / m), 2.0)

    k = 2
    while k <= _NS:
        j = k // 2
        while j >= 1:
            # partner value a[i XOR j]: lanes with bit j clear read i+j
            # (roll left by j), lanes with bit j set read i-j (roll right) —
            # no wraparound crosses a 2j block, so global rolls are exact.
            bc = bit_clear_f(j)

            def swap(a, bc=bc, j=j):
                left = pltpu.roll(a, _NS - j, 1)  # a[(i + j) % NS]
                right = pltpu.roll(a, j, 1)  # a[(i - j) % NS]
                return bc * left + (1.0 - bc) * right

            kp = swap(ang)
            px = swap(relx)
            py = swap(rely)
            kbc = bit_clear_f(k)
            tm = bc * kbc + (1.0 - bc) * (1.0 - kbc)  # ascending lanes
            le = _ge0(kp - ang)  # ang <= kp
            # take own value: ascending lanes when ang <= kp, descending
            # lanes when ang >= kp (ties keep self, matching the bool kernel)
            ts = tm * le + (1.0 - tm) * _ge0(ang - kp)
            ang = tm * jnp.minimum(ang, kp) + (1.0 - tm) * jnp.maximum(ang, kp)
            relx = ts * relx + (1.0 - ts) * px
            rely = ts * rely + (1.0 - ts) * py
            j //= 2
        k *= 2

    # replace invalid tail with the first (lowest-angle) vertex
    vsf = _ge0(_BIG / 2 - ang)
    fx = relx[:, 0:1, :]
    fy = rely[:, 0:1, :]
    relx = vsf * relx + (1.0 - vsf) * fx
    rely = vsf * rely + (1.0 - vsf) * fy

    # shoelace with wraparound
    nx_ = pltpu.roll(relx, _NS - 1, 1)
    ny_ = pltpu.roll(rely, _NS - 1, 1)
    inter = 0.5 * jnp.abs(jnp.sum(relx * ny_ - nx_ * rely, axis=1))
    inter = inter * _ge0(nvalid - 2.5)  # >= 3 vertices

    # quad areas via shoelace of the raw corners
    a1 = 0.5 * jnp.abs(
        jnp.sum(x1 * nxt(y1) - nxt(x1) * y1, axis=1)
    )  # (TI, 1)
    a2 = 0.5 * jnp.abs(jnp.sum(x2 * nxt(y2) - nxt(x2) * y2, axis=1))  # (1, TJ)
    union = a1 + a2 - inter
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
    return pl.pallas_call(
        partial(_iou_tile_kernel, triangular=triangular),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_i, 4, 2), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_j, 4, 2), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_i, tile_j), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(c1.astype(jnp.float32), c2.astype(jnp.float32))
