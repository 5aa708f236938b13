"""Pallas 3x3 SAME conv as three MXU matmuls (the BEV-backbone hot op).

Round-5 stage profile (doc/performance.md): the backbone is the dominant
inference stage at 7.84 ms/scene, and XLA's spatial-conv lowering sustains
only ~43 TFLOP/s at the backbone's shapes while same-FLOPs matmuls hit
~105-110. This kernel reformulates the 3x3 stride-1 conv so ALL of its
arithmetic is plain ``jnp.dot`` on the MXU:

  * The three column taps (dj) are materialised host-side as a lane
    concat: ``xcat[b, h, w, dj*C + c] = xpad[b, h, w + dj, c]`` —
    (B, H+2, W, 3C). XLA emits this as one fused pad+copy pass.
  * ``xcat`` is W-padded to the sublane tile (16 rows bf16 / 8 f32) and
    flattened to (B, (H+2)*Wp, 3C). The three row taps (di) then become
    *aligned major-dim row slices* of the flat buffer:
    rows [di*Wp, di*Wp + H*Wp) are exactly the di-shifted slab, because
    (h + di)*Wp + w = di*Wp + (h*Wp + w). No unaligned sublane access
    anywhere.
  * In-kernel: ``acc = sum_di slab_di @ w[di]`` with w repacked to
    (3, 3*Cin, Cout) — three (H*Wp, 3C) x (3C, Cout) matmuls with f32
    accumulation. K = 3*Cin (192/384/768 at the backbone stages) keeps
    the 128x128 systolic array busy; the junk columns w in [W, Wp) cost
    Wp/W - 1 extra FLOPs (<= 9% at stage 3) and are sliced off after.

Grid = (B,): one map per step; the pipeline double-buffers the next map's
DMA behind the current matmuls. Inference-path only (no custom VJP): the
caller gates on ``train`` (backward stays on XLA's fused conv grads).

Replaces the cost of the reference's cuDNN ``Conv2d(3,3)`` stacks in
``/root/reference/opencood/models/common_modules/base_bev_backbone.py:37-74``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 100 * 1024 * 1024


def _sublane_tile(dtype) -> int:
    return 32 // jnp.dtype(dtype).itemsize  # f32 -> 8, bf16 -> 16


def _padded_w(w: int, dtype) -> int:
    t = _sublane_tile(dtype)
    return -(-w // t) * t


def supports_pallas_conv3x3(shape, dtype, features: int) -> bool:
    """VMEM fit: double-buffered xcat block + out block + f32 accumulator."""
    if len(shape) != 4:
        return False
    _, h, w, c = shape
    if c % 8 or features % 8 or h < 2 or w < 2:
        return False
    item = jnp.dtype(dtype).itemsize
    wp = _padded_w(w, dtype)
    xblk = (h + 2) * wp * 3 * c * item
    oblk = h * wp * features * item
    acc = h * wp * features * 4
    est = 2 * xblk + 2 * oblk + acc + 3 * 3 * c * features * item
    return est <= _VMEM_BUDGET


def conv3x3_im2col(x, w, scale=None, bias=None, *, relu: bool = False):
    """XLA im2col form of the same op: materialise (B,H,W,9C) patches in
    HBM, then one (B·H·W, 9C) x (9C, Cout) matmul + affine + relu.

    Pays 9x activation traffic to buy the MXU matmul rate (probe:
    1x1-conv-at-9C runs 62-82 TFLOP/s vs 33-56 for XLA's 3x3 lowering) —
    wins when the FLOPs/byte of the layer is high enough (256ch stage 3).
    Patches feature order is (c, kh, kw) — the weight transpose below.
    """
    b, h, width, c = x.shape
    _, _, cin, cout = w.shape
    assert cin == c
    p = jax.lax.conv_general_dilated_patches(
        x, (3, 3), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    wf = w.astype(x.dtype).transpose(2, 0, 1, 3).reshape(9 * c, cout)
    out = jnp.dot(
        p.reshape(b * h * width, 9 * c), wf,
        preferred_element_type=jnp.float32,
    )
    if scale is not None:
        out = out * scale.astype(jnp.float32).reshape(1, cout)
    if bias is not None:
        out = out + bias.astype(jnp.float32).reshape(1, cout)
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(x.dtype).reshape(b, h, width, cout)


def _kernel(h, wp, cout, relu, x_ref, w_ref, s_ref, b_ref, o_ref):
    rows = h * wp
    acc = jnp.zeros((rows, cout), jnp.float32)
    for di in range(3):
        slab = x_ref[0, di * wp : di * wp + rows, :]
        acc = acc + jnp.dot(
            slab, w_ref[di], preferred_element_type=jnp.float32
        )
    acc = acc * s_ref[0] + b_ref[0]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[0] = acc.astype(o_ref.dtype)


def _kernel_allmaps(b, h, wp, cout, relu, x_ref, w_ref, s_ref, b_ref, o_ref):
    rows = h * wp
    for m in range(b):
        acc = jnp.zeros((rows, cout), jnp.float32)
        for di in range(3):
            slab = x_ref[m, di * wp : di * wp + rows, :]
            acc = acc + jnp.dot(
                slab, w_ref[di], preferred_element_type=jnp.float32
            )
        acc = acc * s_ref[0] + b_ref[0]
        if relu:
            acc = jnp.maximum(acc, 0.0)
        o_ref[m] = acc.astype(o_ref.dtype)


def supports_pallas_conv3x3_allmaps(shape, dtype, features: int) -> bool:
    """Single-invocation variant: ALL maps resident (no grid, no per-step
    pipeline overhead). Fits stages 2/3 of the flagship backbone."""
    if len(shape) != 4:
        return False
    b, h, w, c = shape
    if c % 8 or features % 8 or h < 2 or w < 2:
        return False
    item = jnp.dtype(dtype).itemsize
    wp = _padded_w(w, dtype)
    est = (
        b * (h + 2) * wp * 3 * c * item
        + b * h * wp * features * item
        + h * wp * features * 4
        + 3 * 3 * c * features * item
    )
    return est <= _VMEM_BUDGET


def conv3x3_same(x, w, scale=None, bias=None, *, relu: bool = False,
                 allmaps: bool = False, interpret: bool = False):
    """3x3 stride-1 SAME conv, NHWC x HWIO -> NHWC, with an optional fused
    per-channel affine + ReLU epilogue (folded eval-mode BatchNorm).

    Matches ``relu(conv(x, w) * scale + bias)`` where the conv is
    ``lax.conv_general_dilated(x, w, (1, 1), [(1,1),(1,1)])`` with f32
    accumulation (the affine runs in f32 before the output cast); output
    dtype = x.dtype. Without the fused epilogue the post-Pallas
    elementwise BN+ReLU pass costs ~2x the activation bytes per layer —
    about as much as the MXU reformulation saves (doc/performance.md r5).
    """
    b, h, width, c = x.shape
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3) and cin == c, (w.shape, x.shape)
    dtype = x.dtype
    wp = _padded_w(width, dtype)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xcat = jnp.concatenate(
        [xp[:, :, dj : dj + width, :] for dj in range(3)], axis=-1
    )
    if wp != width:
        xcat = jnp.pad(xcat, ((0, 0), (0, 0), (0, wp - width), (0, 0)))
    xflat = xcat.reshape(b, (h + 2) * wp, 3 * c)
    wf = w.astype(dtype).reshape(3, 3 * c, cout)
    if scale is None:
        scale = jnp.ones((cout,), jnp.float32)
    if bias is None:
        bias = jnp.zeros((cout,), jnp.float32)
    scale = scale.astype(jnp.float32).reshape(1, cout)
    bias = bias.astype(jnp.float32).reshape(1, cout)

    if allmaps:
        out = pl.pallas_call(
            functools.partial(_kernel_allmaps, b, h, wp, cout, relu),
            out_shape=jax.ShapeDtypeStruct((b, h * wp, cout), dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
            ),
            interpret=interpret,
        )(xflat, wf, scale, bias)
    else:
        out = pl.pallas_call(
            functools.partial(_kernel, h, wp, cout, relu),
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, (h + 2) * wp, 3 * c), lambda i: (i, 0, 0)),
                pl.BlockSpec((3, 3 * c, cout), lambda i: (0, 0, 0)),
                pl.BlockSpec((1, cout), lambda i: (0, 0)),
                pl.BlockSpec((1, cout), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, h * wp, cout), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, h * wp, cout), dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
            ),
            interpret=interpret,
        )(xflat, wf, scale, bias)
    out = out.reshape(b, h, wp, cout)
    return out[:, :, :width, :] if wp != width else out
