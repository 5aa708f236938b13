"""Shared neural building blocks (flax, NHWC).

Conventions:
  * all spatial tensors are channel-last (B, H, W, C) — the native TPU conv
    layout (the torch reference is NCHW);
  * BatchNorm uses the reference's torch hyperparameters (eps=1e-3,
    torch-momentum 0.01 == flax momentum 0.99) so converted checkpoints
    behave identically at inference;
  * compute dtype configurable (bf16 compute / f32 params by default).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

BN_EPS = 1e-3
BN_MOMENTUM = 0.99  # flax: ema = m * ema + (1 - m) * batch


def _conv3x3_mode(shape, dtype, features: int) -> str:
    """Eval-path backend for 3x3 stride-1 convs (the backbone hot op).

    ``AIRV2X_CONV_KERNEL``: ``auto`` (default — currently XLA everywhere:
    the Pallas v1 kernel measures SLOWER than XLA's conv in the composed
    chain, 1.29 vs 0.71 ms/layer at stage 1 — doc/performance.md round 5),
    ``pallas`` (force the Pallas kernel; interpret mode off-TPU — for
    tests and perf experiments), ``im2col`` (XLA patches + matmul),
    ``xla``.
    Read at TRACE time, like AIRV2X_PILLAR_KERNEL (see fast_pillars.py).
    """
    import os

    from airv2x_tpu.ops.pallas_conv import supports_pallas_conv3x3

    mode = os.environ.get("AIRV2X_CONV_KERNEL", "auto")
    fits = supports_pallas_conv3x3(shape, dtype, features)
    if mode == "im2col":
        return "im2col"
    if mode == "pallas":
        if not fits:
            raise ValueError(
                f"AIRV2X_CONV_KERNEL=pallas but {shape} -> {features} "
                "exceeds the kernel's VMEM budget"
            )
        return "interpret" if jax.default_backend() != "tpu" else "pallas"
    return "xla"


class PallasConv3x3(nn.Module):
    """Drop-in for ``nn.Conv(features, (3, 3), padding 1, no bias)`` backed
    by ops/pallas_conv.py — param tree identical to nn.Conv ('kernel',
    HWIO, f32 params), so converted checkpoints load unchanged."""

    features: int
    dtype: Dtype = jnp.float32
    interpret: bool = False

    @nn.compact
    def __call__(self, x):
        from airv2x_tpu.ops.pallas_conv import conv3x3_same

        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features),
            jnp.float32,
        )
        x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        return conv3x3_same(x, kernel, interpret=self.interpret)


class ConvBNReLU(nn.Module):
    """3x3-style Conv -> BatchNorm -> ReLU block of the BEV backbones."""

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mode = (
            _conv3x3_mode(x.shape, self.dtype, self.features)
            if not train and self.kernel == 3 and self.stride == 1
            and not self.is_initializing()
            else "xla"
        )
        if mode != "xla":
            # fused conv + folded eval-BN affine + ReLU path
            # (ops/pallas_conv.py). Init always takes the XLA branch, so
            # the param tree is identical and checkpoints interchange.
            from airv2x_tpu.ops.pallas_conv import (
                conv3x3_im2col,
                conv3x3_same,
            )

            kernel = self.get_variable("params", "Conv_0")["kernel"]
            bnp = self.get_variable("params", "BatchNorm_0")
            bns = self.get_variable("batch_stats", "BatchNorm_0")
            scale = bnp["scale"] * jax.lax.rsqrt(
                bns["var"].astype(jnp.float32) + BN_EPS
            )
            bias = bnp["bias"] - bns["mean"] * scale
            xc, kc = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
            if mode == "im2col":
                return conv3x3_im2col(xc, kc, scale, bias, relu=True)
            return conv3x3_same(
                xc, kc, scale, bias, relu=True,
                interpret=mode == "interpret",
            )
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)] if self.kernel == 3 else "SAME",
            use_bias=False,
            dtype=self.dtype,
            name="Conv_0",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
        )(x)
        return nn.relu(x)


class DeconvBNReLU(nn.Module):
    """Transposed-conv upsampling block (backbone deblocks)."""

    features: int
    stride: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stride >= 1:
            x = nn.ConvTranspose(
                self.features,
                (self.stride, self.stride),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
            )(x)
        else:
            s = int(round(1 / self.stride))
            x = nn.Conv(
                self.features,
                (s, s),
                strides=(s, s),
                use_bias=False,
                dtype=self.dtype,
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
        )(x)
        return nn.relu(x)


class DoubleConv(nn.Module):
    """Conv(k, s) -> ReLU -> Conv3x3 -> ReLU, biased, no norm — faithful twin
    of the reference shrink block (common_modules/downsample_conv.py:8-32)."""

    features: int
    kernel: int
    stride: int
    padding: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # no norm layers; signature kept uniform
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dtype=self.dtype,
        )(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.features, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype
        )(x)
        return nn.relu(x)


class DownsampleConv(nn.Module):
    """Shrink head: stacked DoubleConv blocks
    (reference common_modules/downsample_conv.py:35-53)."""

    dims: Sequence[int]
    kernels: Sequence[int]
    strides: Sequence[int]
    paddings: Sequence[int] | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pads = self.paddings if self.paddings is not None else [1] * len(self.dims)
        for d, k, s, p in zip(self.dims, self.kernels, self.strides, pads):
            x = DoubleConv(d, kernel=k, stride=s, padding=p, dtype=self.dtype)(
                x, train
            )
        return x


class NaiveCompressor(nn.Module):
    """Channel bottleneck compressor, faithful twin of the reference
    (common_modules/naive_compress.py): encoder Conv-BN-ReLU down to
    C/ratio, decoder [Conv-BN-ReLU] x 2 back up to C."""

    channels: int
    compression_rate: int
    dtype: Dtype = jnp.float32

    def _conv_bn_relu(self, x, feats, train):
        x = nn.Conv(feats, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype)(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
        )(x)
        return nn.relu(x)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channels
        hidden = max(c // max(self.compression_rate, 1), 1)
        x = self._conv_bn_relu(x, hidden, train)  # encoder
        x = self._conv_bn_relu(x, c, train)  # decoder[0]
        return self._conv_bn_relu(x, c, train)  # decoder[1]


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the valid rows of a padded point set.

    The reference's PFN BatchNorm1d sees only real voxel rows (ragged M);
    our fixed-capacity layout would otherwise pollute batch statistics with
    padding, so statistics are computed under the mask. At inference
    (running stats) this is identical to the reference.
    """

    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        # x: (..., C); mask: (...) boolean over row dims.
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            m = mask[..., None].astype(jnp.float32)
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            xf = x.astype(jnp.float32)
            mean = jnp.sum(xf * m, axis=tuple(range(x.ndim - 1))) / cnt
            var = (
                jnp.sum((xf - mean) ** 2 * m, axis=tuple(range(x.ndim - 1))) / cnt
            )
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (
                    1 - self.momentum
                ) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon).astype(x.dtype)
        y = (x - mean.astype(x.dtype)) * inv
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)
