"""BEV convolutional backbone (reference BaseBEVBackbone twin, NHWC flax).

Structure (common_modules/base_bev_backbone.py:6-154): N stages of
[stride-s conv + layer_nums[i] residual-free convs], each stage followed by a
transposed-conv "deblock" upsampling back to a common resolution; the ups are
concatenated into ``spatial_features_2d``.

Exposed per-stage so multiscale fusion (Where2comm) can interleave fusion
between stages, mirroring the reference's ``backbone.blocks[i]`` access
(where2comm_fuse.py:217-263).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from airv2x_tpu.models.nn import ConvBNReLU, DeconvBNReLU


class BEVStage(nn.Module):
    features: int
    stride: int
    num_layers: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(self.features, stride=self.stride, dtype=self.dtype)(x, train)
        for _ in range(self.num_layers):
            x = ConvBNReLU(self.features, dtype=self.dtype)(x, train)
        return x


class BaseBEVBackbone(nn.Module):
    layer_nums: Sequence[int]
    layer_strides: Sequence[int]
    num_filters: Sequence[int]
    upsample_strides: Sequence[int]
    num_upsample_filters: Sequence[int]
    remat: bool = False  # rematerialize per-stage activations in backward
    dtype: Any = jnp.float32

    def setup(self):
        # With remat, each stage's conv+BN+ReLU chain is recomputed in the
        # backward pass instead of keeping every intermediate live — trades
        # ~1 extra stage forward for O(stage depth) less activation HBM
        # (the B>=4 training spill cliff, doc/performance.md).
        stage_cls = (
            nn.remat(BEVStage, static_argnums=(2,)) if self.remat else BEVStage
        )
        self.stages = [
            stage_cls(f, s, n, dtype=self.dtype)
            for f, s, n in zip(self.num_filters, self.layer_strides, self.layer_nums)
        ]
        self.deblocks = [
            DeconvBNReLU(f, s, dtype=self.dtype)
            for f, s in zip(self.num_upsample_filters, self.upsample_strides)
        ]
        if len(self.upsample_strides) > len(self.layer_nums):
            self.final_deblock = DeconvBNReLU(
                sum(self.num_upsample_filters),
                self.upsample_strides[-1],
                dtype=self.dtype,
            )
        else:
            self.final_deblock = None

    def stage(self, i: int, x, train: bool = False):
        return self.stages[i](x, train)

    def deblock(self, i: int, x, train: bool = False):
        return self.deblocks[i](x, train)

    def finish(self, ups, train: bool = False):
        x = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        if self.final_deblock is not None:
            x = self.final_deblock(x, train)
        return x

    def __call__(self, x, train: bool = False):
        """(B, H, W, C) -> dict with per-stage features and fused 2d map."""
        from airv2x_tpu.parallel.shardings import shard_spatial

        ups, multiscale = [], {}
        h0 = x.shape[-3]
        x = shard_spatial(x)
        for i in range(len(self.stages)):
            x = self.stages[i](x, train)
            x = shard_spatial(x)
            stride = h0 // x.shape[-3]
            multiscale[f"spatial_features_{stride}x"] = x
            ups.append(self.deblocks[i](x, train) if self.deblocks else x)
        out = self.finish(ups, train)
        return out, multiscale
