"""Faithful camera-trunk building blocks (flax, NHWC).

Flax twins of the reference LSS camera encoders' pretrained torch trunks:

  * ``EfficientNetB0Features`` — the EfficientNet-b0 feature pyramid used by
    ``CamEncode`` (reference ``opencood/models/sub_modules/lss_submodule.py:50-153``,
    which wraps ``efficientnet_pytorch.EfficientNet.from_pretrained``):
    stem + 16 MBConv blocks with squeeze-excitation, swish activations and
    TF-style static SAME padding, returning the ``reduction_3/4/5``
    endpoints consumed by ``get_eff_features`` (``:123-153``).
  * ``ResNet101Trunk`` — the truncated torchvision resnet101 used by
    ``CamEncode_Resnet101`` (``lss_submodule.py:191-274``): conv1/bn1/relu/
    maxpool + layer1 (3 bottlenecks) + layer2 (4 bottlenecks, stride 2);
    layer3 is ``nn.Identity`` in the reference.
  * ``TorchBasicBlock`` — torchvision resnet18 BasicBlock (eps 1e-5), used
    by the BevEncode head (``lss_submodule.py:312-349``).
  * ``upsample_align_corners`` / ``pad_or_crop_to`` — exact equivalents of
    ``nn.Upsample(mode="bilinear", align_corners=True)`` and ``F.pad`` with
    (possibly negative) symmetric-split padding, used by ``Up``
    (``lss_submodule.py:23-47``).

BatchNorm hyperparameters follow each torch source: efficientnet uses
eps=1e-3 / torch-momentum 0.01; torchvision resnet and the Up blocks use
eps=1e-5 / torch-momentum 0.1. Only eps matters for converted-checkpoint
inference parity; momentum is kept for training fidelity.

Deviation: efficientnet's drop-connect (stochastic depth, train-time only)
is not applied — it is an inference no-op and a pure regularizer.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

TORCH_BN_EPS = 1e-5
TORCH_BN_MOMENTUM = 0.9  # torch momentum 0.1 -> flax ema coefficient
EFF_BN_EPS = 1e-3
EFF_BN_MOMENTUM = 0.99  # torch momentum 0.01

# EfficientNet-b0 block args (kernel, stride, expand, in_c, out_c, repeats):
# r1_k3_s1_e1_i32_o16 / r2_k3_s2_e6_i16_o24 / r2_k5_s2_e6_i24_o40 /
# r3_k3_s2_e6_i40_o80 / r3_k5_s1_e6_i80_o112 / r4_k5_s2_e6_i112_o192 /
# r1_k3_s1_e6_i192_o320 (width/depth coefficients are 1.0 for b0).
EFFNET_B0_STAGES = (
    (3, 1, 1, 32, 16, 1),
    (3, 2, 6, 16, 24, 2),
    (5, 2, 6, 24, 40, 2),
    (3, 2, 6, 40, 80, 3),
    (5, 1, 6, 80, 112, 3),
    (5, 2, 6, 112, 192, 4),
    (3, 1, 6, 192, 320, 1),
)


def swish(x):
    return x * jax.nn.sigmoid(x)


def static_same_padding(kernel: int, stride: int):
    """TF-style SAME padding as computed by efficientnet_pytorch's
    Conv2dStaticSamePadding for even feature sizes: total pad k-s split
    (low = pad//2, high = pad - pad//2) — asymmetric for stride 2."""
    pad = max(kernel - stride, 0)
    lo, hi = pad // 2, pad - pad // 2
    return ((lo, hi), (lo, hi))


def upsample_align_corners(x, out_h: int, out_w: int):
    """Bilinear resize matching torch align_corners=True on (..., H, W, C)."""

    def grid(n_in: int, n_out: int):
        if n_out == 1 or n_in == 1:
            c = jnp.zeros((n_out,), jnp.float32)
        else:
            c = jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / (n_out - 1))
        lo = jnp.floor(c).astype(jnp.int32)
        lo = jnp.clip(lo, 0, max(n_in - 2, 0))
        frac = c - lo.astype(jnp.float32)
        return lo, frac

    h, w = x.shape[-3], x.shape[-2]
    ylo, yf = grid(h, out_h)
    xlo, xf = grid(w, out_w)
    top = jnp.take(x, ylo, axis=-3)
    bot = jnp.take(x, jnp.minimum(ylo + 1, h - 1), axis=-3)
    yf = yf[:, None, None].astype(x.dtype)
    xy = top * (1 - yf) + bot * yf
    left = jnp.take(xy, xlo, axis=-2)
    right = jnp.take(xy, jnp.minimum(xlo + 1, w - 1), axis=-2)
    xf = xf[:, None].astype(x.dtype)
    return left * (1 - xf) + right * xf


def pad_or_crop_to(x, out_h: int, out_w: int):
    """torch ``F.pad(x, [dx//2, dx-dx//2, dy//2, dy-dy//2])`` semantics on a
    channel-last tensor, including negative padding (cropping)."""

    def one(arr, axis, target):
        size = arr.shape[axis]
        diff = target - size
        lo, hi = diff // 2, diff - diff // 2
        if lo < 0:
            arr = jax.lax.slice_in_dim(arr, -lo, size, axis=axis)
            lo = 0
        if hi < 0:
            arr = jax.lax.slice_in_dim(arr, 0, arr.shape[axis] + hi, axis=axis)
            hi = 0
        if lo or hi:
            pads = [(0, 0)] * arr.ndim
            pads[axis] = (lo, hi)
            arr = jnp.pad(arr, pads)
        return arr

    x = one(x, x.ndim - 3, out_h)
    return one(x, x.ndim - 2, out_w)


def _bn(train, dtype, eps, momentum, name):
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=momentum,
        epsilon=eps,
        dtype=dtype,
        name=name,
    )


class MBConvBlock(nn.Module):
    """efficientnet_pytorch MBConvBlock: expand -> depthwise -> SE ->
    project, with identity skip when stride==1 and in_c==out_c."""

    in_c: int
    out_c: int
    kernel: int
    stride: int
    expand: int
    se_ratio: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inputs = x
        mid = self.in_c * self.expand
        if self.expand != 1:
            x = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(x)
            x = _bn(train, self.dtype, EFF_BN_EPS, EFF_BN_MOMENTUM, "bn0")(x)
            x = swish(x)
        x = nn.Conv(
            mid, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=static_same_padding(self.kernel, self.stride),
            feature_group_count=mid, use_bias=False, dtype=self.dtype,
            name="depthwise_conv",
        )(x)
        x = _bn(train, self.dtype, EFF_BN_EPS, EFF_BN_MOMENTUM, "bn1")(x)
        x = swish(x)

        # squeeze-excitation (reduction from *input* channels)
        se_c = max(1, int(self.in_c * self.se_ratio))
        s = jnp.mean(x, axis=(-3, -2), keepdims=True)
        s = nn.Conv(se_c, (1, 1), dtype=self.dtype, name="se_reduce")(s)
        s = swish(s)
        s = nn.Conv(mid, (1, 1), dtype=self.dtype, name="se_expand")(s)
        x = x * jax.nn.sigmoid(s)

        x = nn.Conv(self.out_c, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(x)
        x = _bn(train, self.dtype, EFF_BN_EPS, EFF_BN_MOMENTUM, "bn2")(x)
        if self.stride == 1 and self.in_c == self.out_c:
            x = x + inputs
        return x


class EfficientNetB0Features(nn.Module):
    """Stem + MBConv blocks, returning the reduction_3/4/5 endpoints of
    ``CamEncode.get_eff_features`` (lss_submodule.py:123-153): features at
    /8 (40ch), /16 (112ch) and /32 (320ch) of the input resolution."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(32, (3, 3), strides=(2, 2),
                    padding=static_same_padding(3, 2), use_bias=False,
                    dtype=self.dtype, name="conv_stem")(x)
        x = _bn(train, self.dtype, EFF_BN_EPS, EFF_BN_MOMENTUM, "bn0")(x)
        x = swish(x)

        endpoints = {}
        prev = x
        idx = 0
        for kernel, stride, expand, in_c, out_c, repeats in EFFNET_B0_STAGES:
            for r in range(repeats):
                s = stride if r == 0 else 1
                i = in_c if r == 0 else out_c
                nxt = MBConvBlock(
                    in_c=i, out_c=out_c, kernel=kernel, stride=s,
                    expand=expand, dtype=self.dtype, name=f"block{idx}",
                )(x, train)
                if s > 1:
                    endpoints[f"reduction_{len(endpoints) + 1}"] = prev
                prev = x = nxt
                idx += 1
        endpoints[f"reduction_{len(endpoints) + 1}"] = x
        return endpoints["reduction_3"], endpoints["reduction_4"], endpoints[
            "reduction_5"
        ]


class TorchBasicBlock(nn.Module):
    """torchvision resnet BasicBlock (eps 1e-5)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = _bn(train, self.dtype, TORCH_BN_EPS, TORCH_BN_MOMENTUM, "bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = _bn(train, self.dtype, TORCH_BN_EPS, TORCH_BN_MOMENTUM, "bn2")(y)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="ds_conv")(x)
            identity = _bn(train, self.dtype, TORCH_BN_EPS, TORCH_BN_MOMENTUM,
                           "ds_bn")(identity)
        return nn.relu(y + identity)


class TorchBottleneck(nn.Module):
    """torchvision resnet Bottleneck (expansion 4, stride on conv2)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(_bn(train, self.dtype, TORCH_BN_EPS, TORCH_BN_MOMENTUM,
                        "bn1")(y))
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.relu(_bn(train, self.dtype, TORCH_BN_EPS, TORCH_BN_MOMENTUM,
                        "bn2")(y))
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = _bn(train, self.dtype, TORCH_BN_EPS, TORCH_BN_MOMENTUM, "bn3")(y)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="ds_conv")(x)
            identity = _bn(train, self.dtype, TORCH_BN_EPS, TORCH_BN_MOMENTUM,
                           "ds_bn")(identity)
        return nn.relu(y + identity)


class ResNet101Trunk(nn.Module):
    """Truncated resnet101: conv1..layer2 — "Equal to resnet50!"
    (lss_submodule.py:206-216). Output: 512 channels at /8."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = _bn(train, self.dtype, TORCH_BN_EPS, TORCH_BN_MOMENTUM, "bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for i in range(3):
            x = TorchBottleneck(64, stride=1, downsample=(i == 0),
                                dtype=self.dtype, name=f"layer1_{i}")(x, train)
        for i in range(4):
            x = TorchBottleneck(128, stride=2 if i == 0 else 1,
                                downsample=(i == 0), dtype=self.dtype,
                                name=f"layer2_{i}")(x, train)
        return x


class UpBlock(nn.Module):
    """lss_submodule.Up: align_corners bilinear upsample + pad-to-skip +
    concat [skip, x] + (conv3x3 bn relu) x2. BN is torch-default eps 1e-5."""

    out_c: int
    scale: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        x = upsample_align_corners(
            x, x.shape[-3] * self.scale, x.shape[-2] * self.scale
        )
        x = pad_or_crop_to(x, skip.shape[-3], skip.shape[-2])
        x = jnp.concatenate([skip, x], axis=-1)
        for i in range(2):
            x = nn.Conv(self.out_c, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype, name=f"conv{i}")(x)
            x = _bn(train, self.dtype, TORCH_BN_EPS, TORCH_BN_MOMENTUM,
                    f"bn{i}")(x)
            x = nn.relu(x)
        return x
