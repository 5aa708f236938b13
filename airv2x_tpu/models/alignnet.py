"""Feature alignment nets + deformable conv + autoencoder compressor.

TPU twins of the reference's small heterogeneous-alignment blocks:

  * AlignNet dispatcher (sub_modules/feature_alignnet.py:12-39) over
    scaligner / resnet1x1 / resnet3x3 / cbam / convnext / sdta / identity
    (sub_modules/feature_alignnet_modules.py:1-505, cbam.py:10-95). The
    ``fanet`` variant (an image-conditioned KD denoiser) is not ported: no
    shipped reference config instantiates it and its image input is not
    plumbed into any model forward.
  * DCNNet (common_modules/dcn_net.py:1-30): the mmcv DeformConv2d is
    re-built natively — a conv predicts per-position k*k offsets and the
    input is bilinearly gathered at the deformed taps (ops/warp sampler),
    then contracted against the kernel. Gathers + one matmul; no
    torch/mmcv.
  * AutoEncoder (common_modules/auto_encoder.py:1-90): strided
    conv-BN-ReLU halving channels per level, mirrored transposed-conv
    decoder.

All blocks are NHWC and mask-free (they act on already-dense BEV maps).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from airv2x_tpu.models.nn import BN_EPS, BN_MOMENTUM


def _bn(train: bool, dtype):
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM,
        epsilon=BN_EPS,
        dtype=dtype,
    )


class ResMLP(nn.Module):
    """LayerNorm + n x (Linear + GELU) with skip (feature_alignnet_modules
    .py:456-465)."""

    num_layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(dtype=self.dtype)(x)
        for _ in range(self.num_layers):
            y = nn.gelu(nn.Dense(x.shape[-1], dtype=self.dtype)(y))
        return x + y


class SCAligner(nn.Module):
    """Stacked ResMLP blocks over channels (:467-505)."""

    num_blocks: int
    num_layers: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.num_blocks):
            x = ResMLP(self.num_layers, dtype=self.dtype)(x)
        return x


class DeformConv2d(nn.Module):
    """Native deformable conv (mmcv DeformConv2dPack twin): an offset conv
    predicts 2*k*k per-pixel displacements; the input is sampled at the
    displaced taps and contracted with the kernel. mmcv zero-inits the
    offset conv, making the layer a plain conv at init — preserved."""

    features: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        b, h, w, c = x.shape
        off = nn.Conv(
            2 * k * k,
            (k, k),
            padding="SAME",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="offset_conv",
        )(x)  # (B, H, W, 2*k*k) as (dy, dx) pairs per tap
        weight = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, c, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        gy, gx = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32),
            jnp.arange(w, dtype=jnp.float32),
            indexing="ij",
        )
        half = (k - 1) / 2.0
        off = off.reshape(b, h, w, k * k, 2)

        from airv2x_tpu.ops.warp import grid_sample_bilinear

        def one_image(img, offs):
            taps = []
            t = 0
            for dy in range(k):
                for dx in range(k):
                    sy = gy + (dy - half) + offs[..., t, 0]
                    sx = gx + (dx - half) + offs[..., t, 1]
                    taps.append(grid_sample_bilinear(img, sx, sy))
                    t += 1
            return jnp.stack(taps, axis=-2)  # (H, W, k*k, C)

        sampled = jax.vmap(one_image)(x.astype(jnp.float32), off.astype(jnp.float32))
        out = jnp.einsum(
            "bhwtc,tcf->bhwf",
            sampled.astype(self.dtype),
            weight.reshape(k * k, c, self.features).astype(self.dtype),
        )
        return out + bias.astype(self.dtype)


class ResidualBlock(nn.Module):
    """conv-BN-ReLU-conv-BN + skip (feature_alignnet_modules.py:368-402);
    ``deform`` swaps both convs for DeformConv2d."""

    features: int
    kernel: int = 3
    deform: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv(name):
            if self.deform:
                return DeformConv2d(
                    self.features, kernel=self.kernel, dtype=self.dtype, name=name
                )
            return nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                padding="SAME",
                dtype=self.dtype,
                name=name,
            )

        y = nn.relu(_bn(train, self.dtype)(conv("conv1")(x)))
        y = _bn(train, self.dtype)(conv("conv2")(y))
        return nn.relu(y + x)


class ResAligner(nn.Module):
    """Res{1x1,3x3}Aligner (:404-431)."""

    num_blocks: int
    kernel: int
    deform: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.num_blocks):
            x = ResidualBlock(
                x.shape[-1], kernel=self.kernel, deform=self.deform,
                dtype=self.dtype,
            )(x, train)
        return x


class ChannelAttention(nn.Module):
    """avg+max pooled MLP gate (cbam.py:20-37), //16 bottleneck."""

    ratio: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        hidden = max(c // self.ratio, 1)
        mlp = nn.Sequential(
            [
                nn.Dense(hidden, use_bias=False, dtype=self.dtype),
                nn.relu,
                nn.Dense(c, use_bias=False, dtype=self.dtype),
            ]
        )
        avg = mlp(jnp.mean(x, axis=(1, 2)))
        mx = mlp(jnp.max(x, axis=(1, 2)))
        return jax.nn.sigmoid(avg + mx)[:, None, None, :]


class SpatialAttention(nn.Module):
    """7x7 conv over [mean, max] channel maps (cbam.py:39-55)."""

    kernel: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        stacked = jnp.concatenate(
            [
                jnp.mean(x, axis=-1, keepdims=True),
                jnp.max(x, axis=-1, keepdims=True),
            ],
            axis=-1,
        )
        gate = nn.Conv(
            1, (self.kernel, self.kernel), padding="SAME", use_bias=False,
            dtype=self.dtype,
        )(stacked)
        return jax.nn.sigmoid(gate)


class CBAMBlock(nn.Module):
    """1x1-conv residual block with channel+spatial attention
    (cbam.py:62-95)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = nn.relu(
            _bn(train, self.dtype)(
                nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype)(x)
            )
        )
        y = _bn(train, self.dtype)(
            nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype)(y)
        )
        y = ChannelAttention(dtype=self.dtype)(y) * y
        y = SpatialAttention(dtype=self.dtype)(y) * y
        return nn.relu(y + x)


class XCA(nn.Module):
    """Cross-covariance attention over channels (feature_alignnet_modules
    .py:33-71): attention matrix is (C, C) from l2-normalized transposed
    q/k, with a learned temperature."""

    heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, N, C)
        b, n, c = x.shape
        dh = c // self.heads
        temp = self.param("temperature", nn.initializers.ones, (self.heads, 1, 1))
        qkv = nn.Dense(3 * c, dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv.reshape(b, n, 3, self.heads, dh), 3, axis=2)

        def t(a):  # (B, N, 1, H, dh) -> (B, H, dh, N)
            return jnp.moveaxis(a[:, :, 0], 1, -1)

        q, k, v = t(q), t(k), t(v)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-6)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-6)
        attn = jax.nn.softmax(
            jnp.einsum("bhcn,bhdn->bhcd", q, k) * temp, axis=-1
        )
        out = jnp.einsum("bhcd,bhdn->bhcn", attn, v)  # (B, H, dh, N)
        out = jnp.moveaxis(out, -1, 1).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype)(out)


class SDTAAligner(nn.Module):
    """ConvEncoder + SDTAEncoder pairs (feature_alignnet_modules.py:74-178):
    depthwise-conv MLP block, then split-depthwise taps + XCA + MLP."""

    num_blocks: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        for _ in range(self.num_blocks):
            # ConvEncoder: dw7x7 -> LN -> pw MLP (gelu) + skip
            y = nn.Conv(
                c, (7, 7), padding="SAME", feature_group_count=c,
                dtype=self.dtype,
            )(x)
            y = nn.LayerNorm(dtype=self.dtype)(y)
            y = nn.Dense(4 * c, dtype=self.dtype)(y)
            y = nn.gelu(y)
            y = nn.Dense(c, dtype=self.dtype)(y)
            x = x + y

            # SDTAEncoder: cascaded depthwise 3x3 over channel splits,
            # then XCA over flattened pixels + pointwise MLP, both residual
            splits = jnp.split(x, 2, axis=-1)
            d = nn.Conv(
                splits[1].shape[-1], (3, 3), padding="SAME",
                feature_group_count=splits[1].shape[-1], dtype=self.dtype,
            )(splits[1])
            x = jnp.concatenate([splits[0], d], axis=-1)

            b, h, w, _ = x.shape
            flat = x.reshape(b, h * w, c)
            flat = flat + XCA(dtype=self.dtype)(
                nn.LayerNorm(dtype=self.dtype)(flat)
            )
            y = nn.LayerNorm(dtype=self.dtype)(flat)
            y = nn.Dense(4 * c, dtype=self.dtype)(y)
            y = nn.gelu(y)
            y = nn.Dense(c, dtype=self.dtype)(y)
            x = (flat + y).reshape(b, h, w, c)
        return x


class AlignNet(nn.Module):
    """Dispatcher twin of sub_modules/feature_alignnet.py:12-39."""

    cfg: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        method = self.cfg["core_method"]
        args = dict(self.cfg.get("args", {}))
        if method == "identity":
            return x
        if method == "scaligner":
            return SCAligner(
                num_blocks=int(args["num_of_blocks"]),
                num_layers=int(args.get("num_of_layers", 2)),
                dtype=self.dtype,
            )(x, train)
        if method in ("resnet1x1", "resnet3x3"):
            return ResAligner(
                num_blocks=int(args["num_of_blocks"]),
                kernel=1 if method == "resnet1x1" else 3,
                deform=bool(args.get("deform", False)),
                dtype=self.dtype,
            )(x, train)
        if method == "cbam":
            for _ in range(int(args["num_of_blocks"])):
                x = CBAMBlock(dtype=self.dtype)(x, train)
            return x
        if method == "convnext":
            from airv2x_tpu.models.fusion.adapter import _ConvNeXtBlock

            for _ in range(int(args.get("num_of_blocks", args.get("depth", 2)))):
                x = _ConvNeXtBlock(dim=x.shape[-1], dtype=self.dtype)(x)
            return x
        if method == "sdta":
            return SDTAAligner(
                num_blocks=int(args["num_of_blocks"]), dtype=self.dtype
            )(x, train)
        raise ValueError(f"unknown alignnet core_method '{method}'")


class DCNNet(nn.Module):
    """Stacked deformable convs (common_modules/dcn_net.py)."""

    cfg: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        n = int(self.cfg.get("n_blocks", 1))
        outs = self.cfg["out_channels"]
        kernels = self.cfg["kernel_size"]
        for i in range(n):
            x = DeformConv2d(
                int(outs[i]), kernel=int(kernels[i]), dtype=self.dtype
            )(x)
        return x


class AutoEncoder(nn.Module):
    """Conv autoencoder compressor (common_modules/auto_encoder.py:5-90):
    per level [ZeroPad+Conv s2 + BN + ReLU, Conv + BN + ReLU] halving
    channels; decoder mirrors with ConvTranspose k2 s2."""

    feature_num: int
    layer_num: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.feature_num
        for _ in range(self.layer_num):
            x = nn.relu(
                _bn(train, self.dtype)(
                    nn.Conv(
                        c, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=self.dtype,
                    )(x)
                )
            )
            x = nn.relu(
                _bn(train, self.dtype)(
                    nn.Conv(
                        c // 2, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype,
                    )(x)
                )
            )
            c //= 2
        # decoder applied highest-level-first (forward iterates reversed)
        for _ in range(self.layer_num):
            c *= 2
            x = nn.relu(
                _bn(train, self.dtype)(
                    nn.ConvTranspose(
                        c, (2, 2), strides=(2, 2), use_bias=False,
                        dtype=self.dtype,
                    )(x)
                )
            )
            x = nn.relu(
                _bn(train, self.dtype)(
                    nn.Conv(
                        c, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype,
                    )(x)
                )
            )
        return x
