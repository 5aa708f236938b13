"""When2com fusion: learned handshake (query/key matching) agent selection.

Behavioural twin of when2com_modules/when2com.py:16-360: neighbors warped to
the ego frame, a policy CNN + flatten-MLPs produce a global key per agent
and a query for the ego, general dot-product attention (softmax over agents,
optionally thresholded "activated" selection) weights the warped feature
maps.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from airv2x_tpu.models.fusion.common import NEG_INF
from airv2x_tpu.models.nn import BN_EPS, BN_MOMENTUM
from airv2x_tpu.ops.warp import normalized_pairwise_affine, warp_affine_normalized


class _ConvBNRelu(nn.Module):
    filters: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # explicit (1,1) padding: torch's k3 p1 s2 samples different
        # positions than lax SAME (which pads (0,1)) — matters for
        # checkpoint-converted weights
        x = nn.Conv(
            self.filters, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=self.dtype,
        )(x)
        return nn.relu(x)


class PolicyNet(nn.Module):
    """policy_net4 twin: 5 conv blocks, 4x spatial downsample, 256 ch."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _ConvBNRelu(512, dtype=self.dtype)(x, train)
        x = _ConvBNRelu(256, dtype=self.dtype)(x, train)
        x = _ConvBNRelu(256, stride=2, dtype=self.dtype)(x, train)
        x = _ConvBNRelu(256, dtype=self.dtype)(x, train)
        x = _ConvBNRelu(256, stride=2, dtype=self.dtype)(x, train)
        return x


class KMGenerator(nn.Module):
    """km_generator twin: flatten -> 256 -> 128 -> out MLP."""

    out_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat):
        x = feat.reshape(feat.shape[0], -1)
        x = nn.relu(nn.Dense(256, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(128, dtype=self.dtype)(x))
        return nn.Dense(self.out_size, dtype=self.dtype)(x)


class When2comFusion(nn.Module):
    args: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, agent_mask, pairwise_t_full, train: bool = False):
        """x: (B, L, H, W, C) -> (B, H, W, C) fused at the ego node."""
        a = self.args
        b, l, h, w, c = x.shape
        mode = a.get("mode", "softmax")

        aff = normalized_pairwise_affine(
            pairwise_t_full, h, w, a["voxel_size"][0], a["downsample_rate"]
        )
        # warp all agents into the ego (slot 0) frame
        warped = warp_affine_normalized(x, aff[:, 0])  # (B, L, H, W, C)

        flat = warped.reshape((b * l,) + warped.shape[2:])
        qk_maps = PolicyNet(dtype=self.dtype)(flat, train)  # (B*L, H/4, W/4, 256)

        keys = KMGenerator(int(a["key_size"]), name="key_net", dtype=self.dtype)(
            qk_maps
        ).reshape(b, l, -1)
        query = KMGenerator(
            int(a["query_size"]), name="query_net", dtype=self.dtype
        )(qk_maps.reshape((b, l) + qk_maps.shape[1:])[:, 0])  # (B, q)

        query = nn.Dense(int(a["key_size"]), dtype=self.dtype)(query)  # (B, k)
        scores = jnp.einsum("blk,bk->bl", keys, query)
        scores = jnp.where(agent_mask, scores, NEG_INF)
        attn = jax.nn.softmax(scores, axis=-1)  # (B, L)

        if mode == "activated":
            thres = 0.2
            attn = attn * (attn > thres).astype(attn.dtype)

        fused = jnp.einsum("bl,blhwc->bhwc", attn, warped)
        return fused
