"""SCOPE collaboration machinery (flax twins of the reference's
scope_modules/{scope_attn, scope_deformable_transformer,
temporal_fusion_lstm, temporal_late_fusion}.py).

Components:
  * ``ScopeCommunication`` (scope_attn.py:211-297) — gaussian-smoothed
    max-sigmoid confidence maps, threshold masks with the reference's
    even-slot-full-ones quirk, ego-mask comm rate, and the raw "deform"
    confidence maps consumed by the deformable fusion;
  * ``AttenFusion`` / ``MaxFusion`` (:30-48) — simple per-level modes;
  * deformable mode — the reference's scope RPN (scope_deformable_
    transformer.py:453-549) is structurally identical to How2comm's
    (points=9) and is served by fusion/msda.DeformableQueryRefine with a
    per-level nearest-downsampled confidence map;
  * ``SpatialAttentionMTF`` + ``STPNMotionLSTM`` + ``MotionLSTM`` +
    ``SyncLSTM`` -> ``TemporalFusionLSTM`` (temporal_fusion_lstm.py) — the
    pyramid-gated ConvLSTM over the warped ego history (REFERENCE QUIRK
    PRESERVED: the output gate applies V_o to x, not h, :110);
  * ``ScopeLateFusion`` (temporal_late_fusion.py) — 3-way
    confidence-softmax blending of temporal / ego / collaborative maps.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from airv2x_tpu.models.fusion.how2comm import (
    gaussian_kernel_2d,
    gaussian_smooth_2d,
)


class ScopeCommunication(nn.Module):
    """scope_attn.Communication (:211-297), static slots."""

    thre: float
    k_size: int = 5
    c_sigma: float = 1.0

    def __call__(self, psm, agent_mask):
        """psm (B, L, H, W, A) single-agent confidences ->
        (masks (B, L, H, W, 1), comm rate, smoothed conf maps)."""
        conf = jnp.max(jax.nn.sigmoid(psm), axis=-1, keepdims=True)
        smooth = gaussian_smooth_2d(
            conf, gaussian_kernel_2d(self.k_size, self.c_sigma)
        )
        mask = (smooth > self.thre).astype(psm.dtype)
        # quirk: every even agent index transmits fully (:283-286)
        l = mask.shape[1]
        even = (jnp.arange(l) % 2 == 0)[None, :, None, None, None]
        mask = jnp.where(even, jnp.ones_like(mask), mask)
        # comm rate = EGO's own mask fraction (:281), averaged over batch
        h, w = mask.shape[2], mask.shape[3]
        rate = jnp.mean(jnp.sum(mask[:, 0], axis=(1, 2, 3)) / (h * w))
        mask = mask * agent_mask[:, :, None, None, None].astype(mask.dtype)
        smooth = smooth * agent_mask[:, :, None, None, None].astype(mask.dtype)
        return mask, rate, smooth


def atten_fusion(x, agent_mask=None):
    """scope_attn.AttenFusion (:30-40) / coalign_modules' Att_w_Warp
    attention: per-pixel self-attention across agent slots, ego row kept.
    x (B, L, H, W, C) -> (B, H, W, C). ``agent_mask`` excludes padded
    slots from the softmax (the reference operates on ragged unpadded
    stacks)."""
    b, l, h, w, c = x.shape
    seq = x.transpose(0, 2, 3, 1, 4).reshape(b, h * w, l, c)
    score = jnp.einsum("bpic,bpjc->bpij", seq, seq) / jnp.sqrt(
        jnp.asarray(c, jnp.float32)
    )
    if agent_mask is not None:
        score = jnp.where(
            agent_mask[:, None, None, :].astype(bool), score,
            jnp.asarray(-1e9, score.dtype),
        )
    attn = jax.nn.softmax(score, axis=-1)
    out = jnp.einsum("bpij,bpjc->bpic", attn, seq)[:, :, 0]
    return out.reshape(b, h, w, c)


def max_fusion(x):
    """scope_attn.MaxFusion (:43-48)."""
    return jnp.max(x, axis=1)


class SpatialAttentionMTF(nn.Module):
    """temporal_fusion_lstm.SpatialAttention_mtf (:210-233)."""

    kernel_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, curr, prev):
        """curr (B, 1, H, W, C), prev (B, T-1, H, W, C) ->
        gated prev (B, T-1, H, W, C)."""
        k = self.kernel_size
        c_stats = jnp.concatenate(
            [curr[:, 0].mean(-1, keepdims=True), curr[:, 0].max(-1, keepdims=True)],
            axis=-1,
        )
        prev_sum = prev.sum(axis=1)
        p_stats = jnp.concatenate(
            [prev_sum.mean(-1, keepdims=True), prev_sum.max(-1, keepdims=True)],
            axis=-1,
        )
        gate = jax.nn.sigmoid(
            nn.Conv(1, (k, k), padding=[(k // 2, k // 2)] * 2, use_bias=False,
                    dtype=self.dtype, name="conv1")(c_stats + p_stats)
        )[:, None]
        return (1.0 - gate) * jnp.tanh(curr) + gate * prev


class STPNMotionLSTM(nn.Module):
    """temporal_fusion_lstm.STPN_MotionLSTM (:118-208): 2-level conv
    pyramid with nearest-upsample skip merges."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channels

        def cbr(v, out_c, stride, conv, bn):
            v = nn.Conv(out_c, (3, 3), strides=(stride, stride),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        name=conv)(v)
            v = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name=bn)(v)
            return nn.relu(v)

        def up2(v):  # F.interpolate(scale_factor=2), nearest
            return jnp.repeat(jnp.repeat(v, 2, axis=-3), 2, axis=-2)

        x1 = cbr(x, 2 * c, 2, "conv1_1", "bn1_1")
        x1 = cbr(x1, 2 * c, 1, "conv1_2", "bn1_2")
        x2 = cbr(x1, 4 * c, 2, "conv2_1", "bn2_1")
        x2 = cbr(x2, 4 * c, 1, "conv2_2", "bn2_2")
        x7 = cbr(jnp.concatenate([up2(x2), x1], axis=-1), 2 * c, 1,
                 "conv7_1", "bn7_1")
        x7 = cbr(x7, 2 * c, 1, "conv7_2", "bn7_2")
        x8 = cbr(jnp.concatenate([up2(x7), x], axis=-1), c, 1,
                 "conv8_1", "bn8_1")
        return cbr(x8, c, 1, "conv8_2", "bn8_2")


class MotionLSTM(nn.Module):
    """temporal_fusion_lstm.MotionLSTM (:82-115). Reference quirk kept:
    the output gate is sigmoid(U_o(x) + V_o(x) + b_o) — V_o sees x."""

    channels: int
    height: int
    width: int
    dtype: Any = jnp.float32

    def setup(self):
        for g in ("i", "f", "c", "o"):
            setattr(self, f"u_{g}", STPNMotionLSTM(self.channels,
                                                   dtype=self.dtype))
            setattr(self, f"v_{g}", STPNMotionLSTM(self.channels,
                                                   dtype=self.dtype))
        self.b_i = self.param("b_i", nn.initializers.zeros,
                              (1, self.height, self.width, self.channels))
        self.b_f = self.param("b_f", nn.initializers.zeros,
                              (1, self.height, self.width, self.channels))
        self.b_c = self.param("b_c", nn.initializers.zeros,
                              (1, self.height, self.width, self.channels))
        self.b_o = self.param("b_o", nn.initializers.zeros,
                              (1, self.height, self.width, self.channels))

    def __call__(self, x, h, c, train: bool = False):
        i = jax.nn.sigmoid(self.u_i(x, train) + self.v_i(h, train) + self.b_i)
        f = jax.nn.sigmoid(self.u_f(x, train) + self.v_f(h, train) + self.b_f)
        g = jnp.tanh(self.u_c(x, train) + self.v_c(h, train) + self.b_c)
        o = jax.nn.sigmoid(self.u_o(x, train) + self.v_o(x, train) + self.b_o)
        c_out = f * c + i * g
        return o * jnp.tanh(c_out), c_out


class SyncLSTM(nn.Module):
    """temporal_fusion_lstm.SyncLSTM (:11-79): compress 256 -> 64, run the
    MotionLSTM backwards over frames from the oldest, decompress."""

    channel_size: int
    height: int
    width: int
    compressed_size: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x (B, T, H, W, C) frame stack (index 0 = current) -> (B, H, W, C)."""
        b, t = x.shape[:2]
        cs = self.compressed_size
        ratio = max(1, int((self.channel_size / self.compressed_size) ** 0.5))

        def cbr(v, out_c, conv, bn):
            v = nn.Conv(out_c, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, name=conv)(v)
            v = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name=bn)(v)
            return nn.relu(v)

        if cs != self.channel_size:
            flat = x.reshape((b * t,) + x.shape[2:])
            y = cbr(flat, ratio * cs, "conv_pre_1", "bn_pre_1")
            y = cbr(y, cs, "conv_pre_2", "bn_pre_2")
            y = y.reshape((b, t) + y.shape[1:])
        else:
            y = x

        cell = MotionLSTM(cs, self.height, self.width, dtype=self.dtype,
                          name="lstmcell")
        init_c = self.param(
            "init_c", nn.initializers.uniform(1.0),
            (self.height, self.width, cs),
        )
        h = y[:, -1]
        c = jnp.broadcast_to(init_c[None], h.shape)
        for i in range(t - 2, -1, -1):
            h, c = cell(y[:, i], h, c, train)

        if cs != self.channel_size:
            h = cbr(h, ratio * cs, "conv_after_1", "bn_after_1")
            h = cbr(h, self.channel_size, "conv_after_2", "bn_after_2")
        return h


class TemporalFusionLSTM(nn.Module):
    """temporal_fusion_lstm.TemporalFusion_lstm (:236-253)."""

    channel: int
    height: int
    width: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hist, train: bool = False):
        """hist (B, T, H, W, C), index 0 = current ego -> (B, H, W, C)."""
        b = hist.shape[0]
        curr, prev = hist[:, :1], hist[:, 1:]
        gated_prev = SpatialAttentionMTF(dtype=self.dtype,
                                         name="mtf_attention")(curr, prev)
        x_raw = jnp.concatenate([curr, gated_prev], axis=1)
        return SyncLSTM(channel_size=self.channel, height=self.height,
                        width=self.width, dtype=self.dtype,
                        name="sync_lstm")(x_raw, train)


class ScopeLateFusion(nn.Module):
    """temporal_late_fusion.LateFusion: confidence-softmax blend of the
    temporal / ego / collaborative feature maps."""

    thre: float = 0.01
    k_size: int = 5
    c_sigma: float = 1.0

    def __call__(self, feats, psm_temporal, psm_ego, psm_agent):
        """feats: [temporal, ego, cross], each (B, H, W, C)."""
        g2 = gaussian_kernel_2d(self.k_size, self.c_sigma)

        def conf(p):
            c = jnp.max(jax.nn.sigmoid(p), axis=-1, keepdims=True)
            return gaussian_smooth_2d(c, g2)

        total = jnp.concatenate(
            [conf(psm_temporal), conf(psm_ego), conf(psm_agent)], axis=-1
        )
        total = jax.nn.softmax(total, axis=-1)
        return (
            feats[0] * total[..., 0:1]
            + feats[1] * total[..., 1:2]
            + feats[2] * total[..., 2:3]
        )
