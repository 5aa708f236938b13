"""History-warp helper + generic ConvLSTM temporal fusion.

``warp_history_to_current`` aligns history ego features into the current
frame (transform_feature, point_pillar_scope.py:17-51). The faithful SCOPE
temporal stack (SpatialAttention_mtf + STPN-gated MotionLSTM) lives in
fusion/scope.py; the faithful How2comm STCFormer in fusion/stcformer.py.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from airv2x_tpu.ops.warp import normalized_pairwise_affine, warp_affine_normalized


class ConvLSTMCell(nn.Module):
    hidden: int
    kernel: tuple = (3, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, state):
        h, c = state
        z = nn.Conv(4 * self.hidden, self.kernel, padding="SAME", dtype=self.dtype)(
            jnp.concatenate([x, h], axis=-1)
        )
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return h, (h, c)


class TemporalLSTMFusion(nn.Module):
    """ConvLSTM over (B, T, H, W, C) warped history (current frame last)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, history, train: bool = False):
        b, t = history.shape[:2]
        cell = ConvLSTMCell(self.channels, dtype=self.dtype)
        h = jnp.zeros(history[:, 0].shape[:-1] + (self.channels,), history.dtype)
        c = jnp.zeros_like(h)
        state = (h, c)
        for i in range(t):  # oldest -> newest (static unroll, small T)
            out, state = cell(history[:, i], state)
        # gated residual with the current frame
        cur = history[:, -1]
        gate = nn.sigmoid(
            nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype)(
                jnp.concatenate([out, cur], axis=-1)
            )
        )
        return gate * out + (1.0 - gate) * cur


class TemporalLateFusion(nn.Module):
    """Max-over-time late variant (scope_modules/temporal_late_fusion twin)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, history, train: bool = False):
        return jnp.max(history, axis=1)


def warp_history_to_current(feats, delta_t, discrete_ratio, downsample_rate):
    """feats: (B, T, H, W, C) history ego features; delta_t: (B, T, 4, 4)
    transforms from each history ego frame into the CURRENT ego frame.
    Returns features aligned to the current frame."""
    h, w = feats.shape[2], feats.shape[3]
    aff = normalized_pairwise_affine(
        delta_t, h, w, discrete_ratio, downsample_rate
    )  # (B, T, 2, 3)
    return warp_affine_normalized(feats, aff)
