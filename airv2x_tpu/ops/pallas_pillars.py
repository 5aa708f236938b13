"""Fused Pallas pillar-reduction kernel: scatter-max + cell sums in one pass.

Replaces the pillar encoder's two reduction ops (the XLA scatter-max of PFN
features and the MXU bilinear ``cell_mean_sums``) — together ~7.2 ms at the
flagship scale (120k points -> 6 x 140800-cell maps, measured round 4) —
with ONE sequential pass over the points at ~33 ns/point (~4 ms).

Reference cost being replaced: the spconv voxel hash + PillarVFE gather of
``/root/reference/opencood/data_utils/pre_processor/sp_voxel_preprocessor.py:55-120``
and ``common_modules/airv2x_pillar_vfe.py:52-160`` (CPU/CUDA there).

Design (TPU v5e):
  * The whole per-map BEV accumulator lives in VMEM as a single-buffered
    scratch: (cells + 8, 128) f32 = 72 MB for the 704x200 grid (v5e VMEM is
    128 MB; the default conservative limit is raised via
    ``vmem_limit_bytes``). Lanes [0:64] hold the running per-cell feature
    max, lane 64 the point count, lanes [65:68] the running sum of
    cell-center residuals — both reductions ride the same row RMW.
  * Grid = (maps,). Each step zeros the scratch, walks the map's points
    with a scalar ``fori_loop`` (dynamic row read-modify-write in VMEM),
    then DMAs the scratch into the map's HBM output slice.
  * Branch-free inner loop: invalid/padding points are pre-redirected to a
    dump row past the grid (row ``cells``) with value rows that are
    harmless anyway (-1e9 max lanes / 0 sum lanes). This also removes the
    old "spread padding over cells" trick — padding costs one dead RMW
    instead of a serialized hot cell.
  * Why not vectorize over points: a scatter's row address is data-
    dependent; VPU stores need a single base address, so points are
    inherently serial on TPU. Measured floor here: ~33 ns/point, vs XLA's
    scatter at ~56 ns/row (bf16) / ~100 ns (f32) at this scale — and this
    kernel does max AND sums in that one pass.
  * f32 rows only: Mosaic requires dynamic sublane indices to be 8-aligned
    for 16-bit dtypes ("cannot statically prove index is a multiple of 8"),
    so bf16 accumulator rows are not addressable per point. Inputs may be
    bf16; they are widened on the host side of the call.

Numerics: the feature max over f32-widened bf16 values is exact; counts and
residual sums accumulate in f32 (the XLA path accumulated in f32 too, but
from bf16-rounded one-hot matmul operands — the kernel is slightly MORE
accurate). Empty cells report count 0 and max lanes at -1e9; the caller
masks them exactly as with the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
FEAT = 64  # feature lanes [0:64]; lane 64 = count; 65:68 = resid sums
NEG = -1e9
_UNROLL = 8
# (cells + 8) * 128 * 4 bytes must fit VMEM next to the double-buffered
# point block; 180k cells ~= 92 MB scratch -> cap slightly under that.
MAX_CELLS = 165_000


def _kernel(ids_ref, val_ref, sel, out_ref, scratch, sem):
    rows = scratch.shape[0]
    scratch[:] = jnp.broadcast_to(
        jnp.where(sel[:] > 0.5, jnp.float32(NEG), jnp.float32(0.0)),
        (rows, LANES),
    )
    selv = sel[0, :] > 0.5
    n = ids_ref.shape[2]

    def body(k, carry):
        base = k * _UNROLL
        for j in range(_UNROLL):
            p = base + j
            r = ids_ref[0, 0, p]
            row = scratch[r, :]
            v = val_ref[0, p, :]
            scratch[r, :] = jnp.where(selv, jnp.maximum(row, v), row + v)
        return carry

    jax.lax.fori_loop(0, n // _UNROLL, body, 0)

    # tail (n not a multiple of the unroll factor)
    def tail(p, carry):
        r = ids_ref[0, 0, p]
        row = scratch[r, :]
        v = val_ref[0, p, :]
        scratch[r, :] = jnp.where(selv, jnp.maximum(row, v), row + v)
        return carry

    jax.lax.fori_loop((n // _UNROLL) * _UNROLL, n, tail, 0)

    g = pl.program_id(0)
    copy = pltpu.make_async_copy(scratch, out_ref.at[g], sem)
    copy.start()
    copy.wait()


@functools.partial(jax.jit, static_argnames=("cells", "interpret"))
def fused_pillar_reduce(ids, vals, *, cells: int, interpret: bool = False):
    """Per-map fused scatter-max + scatter-add.

    ids:  (m, n) int32 local cell ids in [0, cells); out-of-range/padding
          points must already be redirected to ``cells`` (the dump row).
    vals: (m, n, 128) — lanes [0:64] feature values (use -1e9 for invalid),
          lane 64 the count weight, lanes [65:68] weighted residuals.
    Returns (m, cells + 8, 128) f32; rows [cells:] are the dump rows.
    """
    m, n = ids.shape
    if cells > MAX_CELLS:
        raise ValueError(
            f"grid of {cells} cells exceeds the VMEM-resident kernel limit "
            f"({MAX_CELLS}); use the XLA path"
        )
    rows = cells + 8
    sel = jnp.zeros((1, LANES), jnp.float32).at[0, :FEAT].set(1.0)
    return pl.pallas_call(
        _kernel,
        grid=(m,),
        in_specs=[
            pl.BlockSpec((1, 1, n), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, LANES), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((m, rows, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ids.reshape(m, 1, n), vals.astype(jnp.float32), sel)


def supports_pallas_reduce(cells: int) -> bool:
    return cells <= MAX_CELLS


def reference_pillar_reduce(ids, vals, *, cells: int):
    """XLA twin of ``fused_pillar_reduce`` for tests and fallback."""
    m, n = ids.shape
    rows = cells + 8
    sel = jnp.zeros((LANES,), bool).at[:FEAT].set(True)
    init = jnp.where(sel, jnp.float32(NEG), 0.0)
    out = jnp.broadcast_to(init, (m, rows, LANES))
    vals = vals.astype(jnp.float32)
    flat_ids = (ids + (jnp.arange(m, dtype=ids.dtype) * rows)[:, None]).reshape(-1)
    flat_vals = vals.reshape(-1, LANES)
    acc = out.reshape(m * rows, LANES)
    mx = acc[:, :FEAT].at[flat_ids].max(flat_vals[:, :FEAT])
    sm = acc[:, FEAT:].at[flat_ids].add(flat_vals[:, FEAT:])
    return jnp.concatenate([mx, sm], axis=-1).reshape(m, rows, LANES)
