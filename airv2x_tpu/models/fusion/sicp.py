"""SiCP gated pairwise fusion (twin of sicpfuse_modules/sicp_fuse.py).

Simultaneous individual and cooperative perception: the receiver (ego) and
one sender's warped features produce a learned weight map; in the overlap
region features are blended by the map, outside it the receiver passes
through unchanged.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from airv2x_tpu.models.nn import BN_EPS, BN_MOMENTUM
from airv2x_tpu.ops.warp import normalized_pairwise_affine, warp_affine_normalized


class _ConvBN(nn.Module):
    features: int
    kernel: int
    act: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel), padding="SAME",
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype)(x)
        return nn.relu(x) if self.act == "relu" else nn.sigmoid(x)


class SpatialFusion(nn.Module):
    """Receiver/sender gated fusion (SpatialFusion.forward)."""

    in_channels: int
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, agent_mask, pairwise_t_full, *, discrete_ratio,
                 downsample_rate, train: bool = False):
        # x: (B, L, H, W, C); fuses sender slot 1 into receiver slot 0.
        b, l, h, w, c = x.shape
        rec = x[:, 0]
        sed = x[:, 1] * agent_mask[:, 1, None, None, None].astype(x.dtype)

        aff = normalized_pairwise_affine(
            pairwise_t_full[:, 0, 1], h, w, discrete_ratio, downsample_rate
        )
        t_sed = warp_affine_normalized(sed, aff)
        ones = jnp.ones((b, h, w, 1), x.dtype) * agent_mask[
            :, 1, None, None, None
        ].astype(x.dtype)
        overlap = jnp.mean(warp_affine_normalized(ones, aff), axis=-1, keepdims=True)
        non_overlap = jnp.where(overlap > 0, 0.0, 1.0)

        cat = jnp.concatenate([rec, t_sed], axis=-1)
        comp = _ConvBN(1, 1, dtype=self.dtype)(cat, train)
        f1 = _ConvBN(1, 3, dtype=self.dtype)(comp, train)
        f2 = _ConvBN(1, 3, act="sigmoid", dtype=self.dtype)(f1, train)
        wmap = comp + f2
        wmin = jnp.min(wmap, axis=(1, 2, 3), keepdims=True)
        wmax = jnp.max(wmap, axis=(1, 2, 3), keepdims=True)
        wnorm = (wmap - wmin) / jnp.maximum(wmax - wmin, 1e-9)

        w_rec = rec * (wnorm * overlap + non_overlap)
        w_sed = t_sed * (1.0 - wnorm)
        out = jnp.concatenate([w_rec, w_sed], axis=-1)
        return _ConvBN(self.out_channels, 1, dtype=self.dtype)(out, train)
