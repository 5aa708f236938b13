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
        """x: (B, L, H, W, C) -> (B, H, W, out_channels).

        Every sender j >= 1 is fused pairwise with the ego receiver and the
        per-sender fused maps are averaged over valid senders — the
        reference's multi-agent generalization
        (multiagent_sicp_fuse.py:66-127; module params are shared across
        sender pairs exactly as its single conv stack is)."""
        b, l, h, w, c = x.shape
        rec = x[:, 0]

        # shared conv stacks, created once (param order matches the torch
        # module creation order: compChannels1, conv1, conv2, compChannels2)
        comp1 = _ConvBN(1, 1, dtype=self.dtype)
        conv1 = _ConvBN(1, 3, dtype=self.dtype)
        conv2 = _ConvBN(1, 3, act="sigmoid", dtype=self.dtype)
        comp2 = _ConvBN(self.out_channels, 1, dtype=self.dtype)

        fused_sum = jnp.zeros((b, h, w, self.out_channels), x.dtype)
        count = jnp.zeros((b, 1, 1, 1), x.dtype)
        # reference num_agents == 1 branch returns the RAW ego feature
        # (multiagent_sicp_fuse.py:63-66); that only type-checks when
        # in == out channels, which every shipped config satisfies
        ego_only = rec if c == self.out_channels else comp2(
            jnp.concatenate([rec, jnp.zeros_like(rec)], axis=-1), train
        )
        for j in range(1, l):
            valid = agent_mask[:, j, None, None, None].astype(x.dtype)
            sed = x[:, j] * valid
            aff = normalized_pairwise_affine(
                pairwise_t_full[:, 0, j], h, w, discrete_ratio, downsample_rate
            )
            t_sed = warp_affine_normalized(sed, aff)
            ones = jnp.ones((b, h, w, 1), x.dtype) * valid
            overlap = jnp.mean(
                warp_affine_normalized(ones, aff), axis=-1, keepdims=True
            )
            non_overlap = jnp.where(overlap > 0, 0.0, 1.0)

            cat = jnp.concatenate([rec, t_sed], axis=-1)
            comp = comp1(cat, train)
            f2 = conv2(conv1(comp, train), train)
            wmap = comp + f2
            wmin = jnp.min(wmap, axis=(1, 2, 3), keepdims=True)
            wmax = jnp.max(wmap, axis=(1, 2, 3), keepdims=True)
            wnorm = (wmap - wmin) / jnp.maximum(wmax - wmin, 1e-9)

            w_rec = rec * (wnorm * overlap + non_overlap)
            w_sed = t_sed * (1.0 - wnorm)
            fused = comp2(jnp.concatenate([w_rec, w_sed], axis=-1), train)
            fused_sum = fused_sum + fused * valid
            count = count + valid

        # mean over valid senders; a lone ego keeps its own (zero-padded)
        # pass-through like the reference's num_agents == 1 branch
        mean_fused = fused_sum / jnp.maximum(count, 1.0)
        return jnp.where(count > 0, mean_fused, ego_only)
