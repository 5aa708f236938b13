"""How2comm STCFormer fusion (faithful flax twin of
how2comm_modules/stcformer.py + the deformable query refinement of
how2comm_deformable_transformer.py:430-524 via fusion/msda.py).

Pipeline per BEV scale (STCFormer.forward :148-205):
  * Decoupling (:96-130): split collaborator features into *exclusive*
    ((1-ego_conf)*conf_n gated) and *common* (ego_conf*conf_n gated) parts;
    the map lists carry the ego confidence at slot 0.
  * TemporalAttention (:25-77): ego current + all (warped) history maps,
    time-embedded, fused by per-pixel attention whose key/value are gated
    by globally pooled per-frame 1x1 Conv1d projections. NOTE the
    reference scales scores by sqrt(C) (the module is constructed with the
    *feature* dim) even though q/k live in 2C — preserved.
  * Deformable query refinement: the temporal ego + gated collaborator
    maps are refined by top-K query deformable attention (exclusive branch
    9 sampling points, common branch 3).
  * LateFusion (:79-94): 1-channel gates softmaxed over the two branches.

The reference's per-level ``nn.LayerNorm([C, H, W])`` is constructed but
never used in forward — no flax counterpart (the converter consumes it).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from airv2x_tpu.models.fusion.msda import DeformableQueryRefine


class Decoupling(nn.Module):
    """stcformer.py:96-130 — exclusive/common split of collaborators."""

    exclusive_thre: float = 0.01
    common_thre: float = 0.01

    def __call__(self, feat, conf):
        """feat (B, L, H, W, C), conf (B, L, H, W, 1) -> (exclusive
        (B, L-1, ...), common (B, L-1, ...), exclusive_map (B, L, ...),
        common_map (B, L, ...)); maps carry ego confidence at slot 0."""
        ego_conf = conf[:, :1]
        exc_map_n = (1.0 - ego_conf) * conf[:, 1:]
        com_map_n = ego_conf * conf[:, 1:]
        exc = feat[:, 1:] * (exc_map_n > self.exclusive_thre).astype(feat.dtype)
        com = feat[:, 1:] * (com_map_n > self.common_thre).astype(feat.dtype)
        exc_map = jnp.concatenate([ego_conf, exc_map_n], axis=1)
        com_map = jnp.concatenate([ego_conf, com_map_n], axis=1)
        return exc, com, exc_map, com_map


class TemporalAttention(nn.Module):
    """stcformer.py:25-77."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hist, frame_mask=None):
        """hist (B, T, H, W, C) with index 0 = current ego -> (B, H, W, C).

        frame_mask (B, T): the reference passes only the *present* agents'
        history frames (its ragged list is unpadded,
        how2comm_deformable.py:226-238); masking the attention scores of
        absent static slots reproduces that softmax exactly."""
        b, t, h, w, c = hist.shape
        hd = 2 * self.channels
        flat = hist.reshape(b * t, h, w, c)
        q = nn.Conv(hd, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="conv_query")(hist[:, 0])
        k = nn.Conv(hd, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="conv_key")(flat).reshape(b, t, h, w, hd)
        v = nn.Conv(hd, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="conv_value")(flat).reshape(b, t, h, w, hd)

        # AdaptiveAvgPool -> Conv1d(k=1) gates, broadcast per frame
        k_gate = nn.Dense(hd, dtype=self.dtype, name="conv_temporal_key")(
            k.mean(axis=(2, 3))
        )
        v_gate = nn.Dense(hd, dtype=self.dtype, name="conv_temporal_value")(
            v.mean(axis=(2, 3))
        )
        k = k * k_gate[:, :, None, None]
        v = v * v_gate[:, :, None, None]

        # per-pixel attention: query (B, HW, 1, hd) x key (B, HW, T, hd);
        # the reference divides by sqrt(feature_dim) == sqrt(C)
        qf = q.reshape(b, h * w, 1, hd)
        kf = k.transpose(0, 2, 3, 1, 4).reshape(b, h * w, t, hd)
        vf = v.transpose(0, 2, 3, 1, 4).reshape(b, h * w, t, hd)
        score = jnp.einsum("bpqd,bptd->bpqt", qf, kf) / jnp.sqrt(
            jnp.asarray(self.channels, jnp.float32)
        )
        if frame_mask is not None:
            score = jnp.where(
                frame_mask[:, None, None, :], score, jnp.asarray(-1e9, score.dtype)
            )
        attn = jax.nn.softmax(score, axis=-1)
        ctx = jnp.einsum("bpqt,bptd->bpqd", attn, vf).reshape(b, h, w, hd)
        return nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                       dtype=self.dtype, name="conv_feat")(ctx)


class LateFusion(nn.Module):
    """stcformer.py:79-94 — softmax of two 1-channel gates."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, exc, com):
        w1 = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                     name="gate_1")(exc)
        w2 = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                     name="gate_2")(com)
        w = jax.nn.softmax(jnp.concatenate([w1, w2], axis=-1), axis=-1)
        return w[..., :1] * exc + w[..., 1:] * com


class STCFormer(nn.Module):
    """stcformer.py:148-205 — one BEV scale of the How2comm fusion."""

    channels: int
    level: int
    num_queries: int = 500
    max_cav: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, neighbor_feat, neighbor_conf, history_feat,
                 agent_mask=None, train: bool = False):
        """neighbor_feat (B, L, h, w, C) warped+padded slot maps (ego 0);
        neighbor_conf (B, L, H0, W0, 1) level-0 confidence maps;
        history_feat (B, L, h, w, C) warped history slot maps;
        agent_mask (B, L) gates the history frames in temporal attention.
        Returns (fused ego (B, h, w, C), [temporal, exclusive, common])."""
        if self.level > 0:
            s = 2**self.level  # F.interpolate(scale=0.5/0.25), nearest
            neighbor_conf = neighbor_conf[:, :, ::s, ::s]
        exc, com, exc_map, com_map = Decoupling()(neighbor_feat, neighbor_conf)

        b = neighbor_feat.shape[0]
        ego_cur = neighbor_feat[:, :1]
        hist = jnp.concatenate([ego_cur, history_feat], axis=1)  # (B, 1+L,...)

        delay = jnp.concatenate(
            [jnp.zeros((1,), jnp.float32),
             -jnp.ones((hist.shape[1] - 1,), jnp.float32)]
        )
        time_embed = nn.Dense(self.channels, dtype=self.dtype,
                              name="time_embedding")(delay[:, None])
        hist = hist + time_embed[None, :, None, None, :]

        frame_mask = None
        if agent_mask is not None:
            frame_mask = jnp.concatenate(
                [jnp.ones((b, 1), bool), agent_mask.astype(bool)], axis=1
            )
        ego = TemporalAttention(self.channels, dtype=self.dtype,
                                name="temporal_self_attention")(hist, frame_mask)
        temporal_feat = ego

        exc_in = jnp.concatenate([ego[:, None], exc], axis=1)
        com_in = jnp.concatenate([ego[:, None], com], axis=1)
        ego_exc = DeformableQueryRefine(
            channels=self.channels, n_points=9, num_queries=self.num_queries,
            max_cav=self.max_cav, dtype=self.dtype, name="exclusive_encoder",
        )(exc_in, exc_map)
        ego_com = DeformableQueryRefine(
            channels=self.channels, n_points=3, num_queries=self.num_queries,
            max_cav=self.max_cav, dtype=self.dtype, name="common_encoder",
        )(com_in, com_map)

        fused = LateFusion(dtype=self.dtype, name="late_fusion")(ego_exc,
                                                                 ego_com)
        return fused, [temporal_feat, ego_exc, ego_com]
