"""ResNet-style BEV backbone (flax twin of common_modules/
base_bev_backbone_resnet.py + sub_modules/resblock.py).

Supports BasicBlock and (ResNeXt-style) grouped Bottleneck with
expansion=1, exposing ``get_multiscale_feature`` / ``decode_multiscale``
for HEAL-style per-level fusion.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from airv2x_tpu.models.nn import BN_EPS, BN_MOMENTUM


def _bn(train, dtype):
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM,
        epsilon=BN_EPS,
        dtype=dtype,
    )


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        # explicit (1,1) padding: torch k3 p1 s2 samples differently than
        # lax SAME (which pads (0,1)) — matters for converted checkpoints
        y = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
        )(x)
        y = nn.relu(_bn(train, self.dtype)(y))
        y = nn.Conv(self.planes, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(y)
        y = _bn(train, self.dtype)(y)
        if self.downsample:
            identity = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype,
            )(x)
            identity = _bn(train, self.dtype)(identity)
        return nn.relu(y + identity)


class BottleneckX(nn.Module):
    """ResNeXt bottleneck with expansion 1 (HEAL: groups=32, width=4)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 32
    width_per_group: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * (self.width_per_group / 64.0)) * self.groups
        identity = x
        y = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(_bn(train, self.dtype)(y))
        y = nn.Conv(
            width, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            feature_group_count=self.groups, use_bias=False, dtype=self.dtype,
        )(y)
        y = nn.relu(_bn(train, self.dtype)(y))
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = _bn(train, self.dtype)(y)
        if self.downsample:
            identity = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype,
            )(x)
            identity = _bn(train, self.dtype)(identity)
        return nn.relu(y + identity)


class ResNetStage(nn.Module):
    planes: int
    blocks: int
    stride: int
    in_planes: int
    resnext: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls = BottleneckX if self.resnext else BasicBlock
        need_ds = self.stride != 1 or self.in_planes != self.planes
        x = block_cls(
            self.planes, self.stride, downsample=need_ds, dtype=self.dtype
        )(x, train)
        for _ in range(1, self.blocks):
            x = block_cls(self.planes, 1, downsample=False, dtype=self.dtype)(
                x, train
            )
        return x


class ResNetBEVBackbone(nn.Module):
    layer_nums: Sequence[int]
    layer_strides: Sequence[int]
    num_filters: Sequence[int]
    upsample_strides: Sequence[int] = ()
    num_upsample_filters: Sequence[int] = ()
    inplanes: int = 64
    resnext: bool = False
    remat: bool = False  # recompute per-stage activations in backward
    dtype: Any = jnp.float32

    def setup(self):
        ins = [self.inplanes, *self.num_filters[:-1]]
        stage_cls = (
            nn.remat(ResNetStage, static_argnums=(2,))
            if self.remat else ResNetStage
        )
        self.stages = [
            stage_cls(
                planes=f,
                blocks=n,
                stride=s,
                in_planes=i,
                resnext=self.resnext,
                dtype=self.dtype,
            )
            for f, n, s, i in zip(
                self.num_filters, self.layer_nums, self.layer_strides, ins
            )
        ]
        from airv2x_tpu.models.bev_backbone import DeconvBNReLU

        self.deblocks = [
            DeconvBNReLU(f, s, dtype=self.dtype)
            for f, s in zip(self.num_upsample_filters, self.upsample_strides)
        ]

    def get_multiscale_feature(self, x, train: bool = False):
        feats = []
        for stage in self.stages:
            x = stage(x, train)
            feats.append(x)
        return feats

    def decode_multiscale(self, feats, train: bool = False):
        if not self.deblocks:
            out = feats[-1] if len(feats) == 1 else feats
            return out if not isinstance(out, list) else out[-1]
        ups = [self.deblocks[i](f, train) for i, f in enumerate(feats)]
        return jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]

    def __call__(self, x, train: bool = False):
        feats = self.get_multiscale_feature(x, train)
        return self.decode_multiscale(feats, train), feats
