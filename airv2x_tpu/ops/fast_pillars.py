"""Sort-free PointPillars encoder: points -> BEV grid in one fused pass.

The classic pillar pipeline (ops/voxelize.py, behavioural twin of the
reference's SpVoxelPreprocessor + PillarVFE,
data_utils/pre_processor/sp_voxel_preprocessor.py:55-120 +
common_modules/airv2x_pillar_vfe.py:52-160) sorts points by cell id to build
a (P, K, F) pillar tensor, runs the PFN, then scatters pillar features to the
BEV grid. The sort and the (P, K, F) gather dominate the encoder cost on TPU
(~17 ms of a 25 ms encoder at 120k points).

This module exploits that the PFN's Linear/BN/ReLU are *pointwise over
points*: the max over a pillar's points commutes with everything before it.
So instead of sorting:

  1. cell id per point (elementwise),
  2. per-cell count + xyz sum via scatter-add -> per-cell mean,
  3. gather the mean back per point, build the standard 10-dim augmentation,
  4. one (N, 10) x (10, C) matmul + masked BN + ReLU over ALL points,
  5. scatter-max the per-point features straight into the (ny, nx, C) grid.

Measured 4.05 ms vs ~21 ms for the sort-based path at 120k points / 140k
cells on TPU v5e.

Semantics deltas vs the reference (documented, config-gated):
  * no ``max_points_per_voxel`` cap — every in-range point contributes to
    its pillar's max (the reference truncates to the first 32 after shuffle);
  * no ``max_voxel`` cap — all occupied cells are kept (the reference keeps
    the first 16k pillars);
  * BN statistics therefore see all points rather than the capped subset.
Both caps exist for torch memory layout reasons, not modelling ones; the
fast path has no per-pillar tensor to cap.

Only the single-PFN-layer configuration (the standard ``num_filters: [64]``)
is supported — multi-layer PFNs need the pillar-max broadcast back to points,
which reintroduces the gather (those configs fall back to the classic path).
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _pillar_kernel_mode(cells: int, out_c: int, dtype) -> str:
    """Pick the eval-path reduction backend.

    ``AIRV2X_PILLAR_KERNEL``: ``auto`` (default — the fused Pallas encode
    kernel on TPU when the grid + output buffer fit its VMEM-resident
    accumulator and the feature width fits its 64 max lanes, XLA
    otherwise), ``pallas`` (force; runs in interpret mode off-TPU — for
    tests), ``xla`` (force the two-op path).

    NOTE: the env var is read at TRACE time (module ``__call__``). Once a
    jitted graph is traced and cached in-process, changing the variable has
    no effect on that graph — set it before the first call, or start a new
    process (same for ``AIRV2X_ENC_BARRIER`` in models/base.py; ADVICE r4).
    """
    from airv2x_tpu.ops.pallas_pillars import FEAT, supports_pallas_encode

    mode = os.environ.get("AIRV2X_PILLAR_KERNEL", "auto")
    fits = supports_pallas_encode(cells, dtype) and out_c <= FEAT
    if mode == "pallas":
        if not fits:
            raise ValueError(
                f"AIRV2X_PILLAR_KERNEL=pallas but grid ({cells} cells, "
                f"{out_c} features, {jnp.dtype(dtype).name}) exceeds the "
                "kernel limits"
            )
        return "interpret" if jax.default_backend() != "tpu" else "pallas"
    if mode == "auto" and fits and jax.default_backend() == "tpu":
        return "pallas"
    return "xla"


def cell_mean_sums(resid, iy, ix, w, ny, nx, dtype, chunk=2048):
    """Per-cell [count, sum(resid)] via one-hot bilinear matmuls on the MXU.

    The per-cell sum S[y, x, c] = sum_p 1[iy_p = y] * 1[ix_p = x] * v_p[c]
    is a bilinear form in the two one-hot factors, so it maps to matmuls
    (MXU, ~1-2 ms for 120k points) instead of a scatter-add (~4.3 ms at
    XLA's ~25k update rows/ms — see doc/performance.md). ``resid`` must be
    cell-center residuals (|r| <= voxel_size/2): the tiny dynamic range
    makes bf16 operands exact to ~1e-3 absolute, and accumulation is f32.

    resid (m, n, 3), iy/ix (m, n) int32, w (m, n) float {0,1} ->
    (m, ny, nx, 4) f32 sums [count, sum rx, sum ry, sum rz].
    """
    m, n = w.shape
    chunk = min(chunk, max(n, 1))
    pad = (-n) % chunk
    if pad:
        resid = jnp.pad(resid, ((0, 0), (0, pad), (0, 0)))
        iy = jnp.pad(iy, ((0, 0), (0, pad)))
        ix = jnp.pad(ix, ((0, 0), (0, pad)))
        w = jnp.pad(w, ((0, 0), (0, pad)))
    steps = (n + pad) // chunk
    vals = jnp.concatenate(
        [w[..., None], resid * w[..., None]], axis=-1
    ).astype(dtype)
    xs = (
        iy.reshape(m, steps, chunk).transpose(1, 0, 2),
        ix.reshape(m, steps, chunk).transpose(1, 0, 2),
        vals.reshape(m, steps, chunk, 4).transpose(1, 0, 2, 3),
    )
    ygrid = jnp.arange(ny, dtype=jnp.int32)
    xgrid = jnp.arange(nx, dtype=jnp.int32)

    def body(acc, sl):
        iyc, ixc, vc = sl
        y1 = (iyc[..., None] == ygrid).astype(dtype)  # (m, chunk, ny)
        x1 = (ixc[..., None] == xgrid).astype(dtype)  # (m, chunk, nx)
        yv = (y1[..., None] * vc[:, :, None, :]).reshape(m, chunk, ny * 4)
        acc = acc + jax.lax.dot_general(
            x1, yv,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (m, nx, ny*4)
        return acc, ()

    acc, _ = jax.lax.scan(body, jnp.zeros((m, nx, ny * 4), jnp.float32), xs)
    return acc.reshape(m, nx, ny, 4).transpose(0, 2, 1, 3)


def point_cell_ids(points, mask, lidar_range, voxel_size, nx, ny):
    """Per-point flat BEV cell id.

    points (..., N, F>=3); mask (..., N) -> (ids (..., N) int32 in
    [0, ny*nx), valid (..., N)). Out-of-range points are invalidated.
    """
    x0, y0, z0, x1, y1, z1 = [float(v) for v in lidar_range[:6]]
    vx, vy = float(voxel_size[0]), float(voxel_size[1])
    ix = jnp.floor((points[..., 0] - x0) / vx).astype(jnp.int32)
    iy = jnp.floor((points[..., 1] - y0) / vy).astype(jnp.int32)
    valid = (
        mask
        & (ix >= 0)
        & (ix < nx)
        & (iy >= 0)
        & (iy < ny)
        & (points[..., 2] >= z0)
        & (points[..., 2] <= z1)
    )
    ids = jnp.clip(iy, 0, ny - 1) * nx + jnp.clip(ix, 0, nx - 1)
    return jnp.where(valid, ids, 0), valid


class FastPillarBEV(nn.Module):
    """Points straight to a (ny, nx, C) BEV map, no sort, no pillar tensor.

    Parameter structure mirrors a single PFNLayer (Dense + MaskedBatchNorm)
    so the math matches PillarVFE with ``num_filters: [C]`` exactly up to the
    capping deltas documented in the module docstring.
    """

    num_filters: Sequence[int]
    voxel_size: Sequence[float]
    lidar_range: Sequence[float]
    use_norm: bool = True
    with_distance: bool = False
    use_absolute_xyz: bool = True
    # hetero agents keep their own constants for the center-offset features
    # while voxelizing on the shared ego grid (airv2x_base_model.py:49-55);
    # None -> same as the grid constants.
    offset_voxel_size: Sequence[float] | None = None
    offset_lidar_range: Sequence[float] | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, mask, train: bool = False):
        """points (..., N, F>=4), mask (..., N) -> (..., ny, nx, C).

        Leading dims (batch, agents) are folded into one global scatter by
        offsetting cell ids, so BN statistics stay global over all points —
        matching the classic path's batched PillarVFE.
        """
        if len(self.num_filters) != 1:
            raise ValueError(
                "FastPillarBEV supports single-PFN-layer configs only; got "
                f"num_filters={list(self.num_filters)} (use the classic path)"
            )
        out_c = int(self.num_filters[0])
        lr, vs = self.lidar_range, self.voxel_size
        nx = int(round((lr[3] - lr[0]) / vs[0]))
        ny = int(round((lr[4] - lr[1]) / vs[1]))
        cells = ny * nx

        lead = points.shape[:-2]
        n = points.shape[-2]
        m = 1
        for d in lead:
            m *= d
        pts_flat = points.reshape(m * n, points.shape[-1])
        mask_flat = mask.reshape(m * n)

        ids, valid = point_cell_ids(pts_flat, mask_flat, lr, vs, nx, ny)
        # Spread invalid points uniformly over cells instead of parking them
        # all at cell 0: their contributions are already nullified (w=0 for
        # the mean sums, -1e9 for the max), but tens of thousands of
        # duplicate writes to ONE address serialize the TPU scatter —
        # measured 17 ms vs 5 ms per scene on padded clouds.
        spread = jnp.arange(ids.shape[0], dtype=jnp.int32) % cells
        ids = jnp.where(valid, ids, spread)
        row = jnp.repeat(jnp.arange(m, dtype=jnp.int32), n)
        gids = row * cells + ids  # offset ids: one scatter for all maps
        pts = pts_flat.astype(self.dtype)
        w = valid.astype(jnp.float32)

        # cell-center offsets (identical formula to augment_pillar_points)
        ovs = self.offset_voxel_size or vs
        olr = self.offset_lidar_range or lr
        cx = ((ids % nx).astype(self.dtype) + 0.5) * ovs[0] + olr[0]
        cy = ((ids // nx).astype(self.dtype) + 0.5) * ovs[1] + olr[1]
        cz = jnp.full_like(cx, ovs[2] / 2 + olr[2])
        f_center = jnp.stack(
            [pts[:, 0] - cx, pts[:, 1] - cy, pts[:, 2] - cz], axis=-1
        )
        prefix = pts if self.use_absolute_xyz else pts[:, 3:]

        from airv2x_tpu.models.nn import MaskedBatchNorm  # lazy: avoids
        # ops <-> models registry import cycle

        dense = nn.Dense(out_c, use_bias=not self.use_norm, dtype=self.dtype)
        bn = MaskedBatchNorm(dtype=self.dtype) if self.use_norm else None
        neg = jnp.asarray(-1e9, self.dtype)

        if train:
            return self._train_path(
                pts, prefix, f_center, valid, gids, dense, bn, neg,
                lead, m, cells, nx, ny, out_c,
            )

        # ---- fused eval path: ONE scatter instead of two + a gather ----
        # In eval mode BN is a fixed per-channel affine a*x + b, and
        # relu(a*x+b) is monotone in x (non-decreasing for a>=0, non-
        # increasing for a<0), so the per-pillar max commutes with the
        # whole PFN head. The pillar mean enters every point of a cell
        # through the SAME term W_cl @ mean_cell (W_cl = the f_cluster rows
        # of the dense kernel), so:
        #   feat_cell = relu(bn(smax_cell - W_cl @ mean_cell))
        # where smax_cell[c] = max_p u_p[c] if a_c >= 0 else min_p u_p[c]
        # and u_p = dense([prefix, xyz, f_center]). The per-point side is
        # one matmul + one scatter-max; the mean-gather disappears and the
        # cell-mean sums run on the MXU (cell_mean_sums) instead of a
        # scatter-add. Same math as the reference PFN
        # (airv2x_pillar_vfe.py:52-160) up to fp reassociation.
        feats = [prefix, pts[:, :3], f_center]
        if self.with_distance:
            feats.append(jnp.linalg.norm(pts[:, :3], axis=-1, keepdims=True))
        x_tilde = jnp.concatenate(feats, axis=-1)
        x_tilde = jnp.where(valid[:, None], x_tilde, 0.0)
        d_in = x_tilde.shape[-1]
        u = dense(x_tilde)  # (N, C), bias (if any) included once

        if self.use_norm:
            # read the eval affine off the module itself so dtype rounding
            # matches the per-point path: bn(0) = b, diag(bn(I)) = a + b
            probe = bn(
                jnp.concatenate(
                    [jnp.zeros((1, out_c), self.dtype),
                     jnp.eye(out_c, dtype=self.dtype)], axis=0
                ),
                jnp.zeros((out_c + 1,), bool),
                False,
            )
            b_aff = probe[0]
            a_aff = jnp.diagonal(probe[1:]) - b_aff
            flip = jnp.where(a_aff >= 0, 1.0, -1.0).astype(self.dtype)
        else:
            flip = jnp.ones((out_c,), self.dtype)

        # per-cell means need cell-center residuals (grid constants, NOT the
        # offset constants: the residual range must be bounded by the grid
        # voxel for bf16 accuracy)
        gx = ((ids % nx).astype(self.dtype) + 0.5) * vs[0] + lr[0]
        gy = ((ids // nx).astype(self.dtype) + 0.5) * vs[1] + lr[1]
        gz = jnp.full_like(gx, vs[2] / 2 + lr[2])
        resid = jnp.stack(
            [pts[:, 0] - gx, pts[:, 1] - gy, pts[:, 2] - gz], axis=-1
        )

        mode = _pillar_kernel_mode(cells, out_c, self.dtype)
        if mode != "xla":
            # ONE fully fused Pallas pass: feature scatter-max +
            # count/residual scatter-add ride the same VMEM row RMW, and the
            # whole PFN epilogue (cell mean -> W_cl @ mean -> BN affine ->
            # relu -> padding floor -> occupancy mask) runs in-kernel so
            # only the FINAL grid leaves VMEM (ops/pallas_pillars.py; the
            # reduce-only kernel lost its isolation win to a 432 MB HBM
            # round trip — doc/performance.md round 4).
            from airv2x_tpu.ops.pallas_pillars import (
                FEAT, LANES, NEG, fused_pillar_encode,
            )

            ids_k = jnp.where(valid, ids, cells).reshape(m, n)
            uf = jnp.where(
                valid[:, None], (u * flip).astype(jnp.float32), NEG
            )
            lanes = [uf]
            if out_c < FEAT:
                lanes.append(
                    jnp.full((m * n, FEAT - out_c), NEG, jnp.float32)
                )
            lanes += [
                w[:, None],
                resid.reshape(m * n, 3).astype(jnp.float32) * w[:, None],
                jnp.zeros((m * n, LANES - FEAT - 4), jnp.float32),
            ]
            # padding floor relu(bn(dense(0))) (see the XLA path below)
            zrow = jnp.zeros((1, d_in), self.dtype)
            pf = dense(zrow)
            if self.use_norm:
                pf = bn(pf, jnp.zeros((1,), bool), False)
            pad_floor = nn.relu(pf)[0]
            # W_cl rows via the dense module itself: unit means embedded in
            # the f_cluster slot, bias removed with the zero probe
            pw = prefix.shape[-1]
            basis = (
                jnp.zeros((3, d_in), self.dtype)
                .at[:, pw:pw + 3].set(jnp.eye(3, dtype=self.dtype))
            )
            wcl = dense(basis) - dense(zrow)  # (3, out_c)
            if self.use_norm:
                a_k, b_k = a_aff, b_aff
            else:
                a_k = jnp.ones((out_c,), self.dtype)
                b_k = jnp.zeros((out_c,), self.dtype)
            params = jnp.zeros((8, LANES), jnp.float32)
            params = params.at[0:3, :out_c].set(wcl.astype(jnp.float32))
            params = params.at[3, :out_c].set(a_k.astype(jnp.float32))
            params = params.at[4, :out_c].set(b_k.astype(jnp.float32))
            params = params.at[5, :out_c].set(flip.astype(jnp.float32))
            params = params.at[6, :out_c].set(pad_floor.astype(jnp.float32))
            grid = fused_pillar_encode(
                ids_k.astype(jnp.int32),
                jnp.concatenate(lanes, axis=-1).reshape(m, n, LANES),
                params,
                cells=cells,
                nx=nx,
                grid_consts=(
                    float(vs[0]), float(vs[1]),
                    float(lr[0]) + 0.5 * float(vs[0]),
                    float(lr[1]) + 0.5 * float(vs[1]),
                    float(vs[2]) / 2 + float(lr[2]),
                ),
                out_dtype=self.dtype,
                interpret=(mode == "interpret"),
            )  # (m, cells, FEAT) final masked grid
            return grid[..., :out_c].reshape(lead + (ny, nx, out_c))

        uf = jnp.where(valid[:, None], u * flip, neg)
        smax = jnp.full((m * cells, out_c), neg, self.dtype).at[gids].max(uf)
        # MXU bilinear one-hot matmuls for the cell sums
        sums = cell_mean_sums(
            resid.reshape(m, n, 3),
            (ids // nx).reshape(m, n),
            (ids % nx).reshape(m, n),
            w.reshape(m, n),
            ny, nx, self.dtype,
        )  # (m, ny, nx, 4) f32
        cnt = sums[..., 0].reshape(m * cells)
        ccx = (jnp.arange(nx, dtype=jnp.float32) + 0.5) * vs[0] + lr[0]
        ccy = (jnp.arange(ny, dtype=jnp.float32) + 0.5) * vs[1] + lr[1]
        denom = jnp.maximum(sums[..., :1], 1.0)
        mean = jnp.stack(
            [
                sums[..., 1] / denom[..., 0] + ccx[None, None, :],
                sums[..., 2] / denom[..., 0] + ccy[None, :, None],
                sums[..., 3] / denom[..., 0] + (vs[2] / 2 + lr[2]),
            ],
            axis=-1,
        ).reshape(m * cells, 3).astype(self.dtype)

        # W_cl @ mean via the dense module itself (mean embedded in the
        # f_cluster slot, bias removed with a zero probe) — keeps the
        # kernel access inside the module's own arithmetic
        pw = prefix.shape[-1]
        emb = jnp.concatenate(
            [
                jnp.zeros((m * cells, pw), self.dtype),
                mean,
                jnp.zeros((m * cells, d_in - pw - 3), self.dtype),
            ],
            axis=-1,
        )
        zrow = jnp.zeros((1, d_in), self.dtype)
        m_cell = dense(emb) - dense(zrow)

        v = smax * flip - m_cell
        if self.use_norm:
            v = bn(v, jnp.zeros((m * cells,), bool), False)
        feat = nn.relu(v)

        # relu(bn(dense(0))): the constant the reference's zeroed padding
        # rows contribute to every non-full pillar's max
        # (airv2x_pillar_vfe.py:152-158), applied as a floor to occupied
        # cells; the only deviation left is pillars with exactly
        # max_points_per_voxel points, which have no padding rows there.
        pf = dense(zrow)
        if self.use_norm:
            pf = bn(pf, jnp.zeros((1,), bool), False)
        pad_floor = nn.relu(pf)[0]

        occupied = cnt[:, None] > 0
        grid = jnp.where(
            occupied, jnp.maximum(feat, pad_floor[None, :]), 0.0
        )
        return grid.reshape(lead + (ny, nx, out_c))

    def _train_path(
        self, pts, prefix, f_center, valid, gids, dense, bn, neg,
        lead, m, cells, nx, ny, out_c,
    ):
        """Classic two-scatter path (training needs per-point BN batch
        statistics over the full augmented features, which the fused eval
        decomposition does not produce)."""
        import os

        barrier = "scatter" in os.environ.get(
            "AIRV2X_ENC_BARRIER", ""
        ).split(",")
        w = valid.astype(jnp.float32)
        # per-cell mean via one fused scatter-add of [1, x, y, z]
        ones_xyz = jnp.concatenate(
            [w[:, None], pts[:, :3].astype(jnp.float32) * w[:, None]], axis=1
        )
        cell_sums = jnp.zeros((m * cells, 4), jnp.float32).at[gids].add(ones_xyz)
        if barrier:
            cell_sums = jax.lax.optimization_barrier(cell_sums)
        mean = cell_sums[:, 1:] / jnp.maximum(cell_sums[:, :1], 1.0)
        f_cluster = pts[:, :3] - mean[gids].astype(self.dtype)

        feats = [prefix, f_cluster, f_center]
        if self.with_distance:
            feats.append(jnp.linalg.norm(pts[:, :3], axis=-1, keepdims=True))
        x = jnp.concatenate(feats, axis=-1)
        x = jnp.where(valid[:, None], x, 0.0)

        # One all-zero probe row rides along (mask False so it never touches
        # BN statistics): its output is relu(bn(0)) — the padding floor
        # (see the eval path note above).
        probe = jnp.zeros((1, x.shape[-1]), x.dtype)
        x = jnp.concatenate([x, probe], axis=0)
        valid_ext = jnp.concatenate([valid, jnp.zeros((1,), bool)])
        x = dense(x)
        if self.use_norm:
            x = bn(x, valid_ext, True)
        x = nn.relu(x)
        pad_floor = x[-1]  # (C,)
        x = x[:-1]

        x = jnp.where(valid[:, None], x, neg)
        grid = jnp.full((m * cells, out_c), neg, x.dtype).at[gids].max(x)
        occupied = grid > neg / 2
        grid = jnp.where(
            occupied, jnp.maximum(grid, pad_floor[None, :]), 0.0
        )
        return grid.reshape(lead + (ny, nx, out_c))
