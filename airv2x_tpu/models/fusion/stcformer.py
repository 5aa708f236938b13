"""How2comm STCFormer fusion: decoupled deformable collaboration + temporal
attention (twin of how2comm_modules/stcformer.py and
how2comm_deformable_transformer.py:430-524).

Pipeline per scale:
  * Decoupling (:96-130): split neighbour features into *exclusive*
    ((1-ego_conf)·conf_n gated) and *common* (ego_conf·conf_n gated) parts.
  * TemporalAttention (:25-77): ego history frames (+time embedding) fused
    by per-pixel attention with channel-pooled temporal key/value gates.
  * Deformable query refinement (:430-524): the top-K most confident BEV
    cells become queries; each query deformably samples every agent's map
    (n_points per head per agent) and the refined features are scattered
    back into the ego map. Exclusive branch uses 9 points, common 3.
  * LateFusion (:79-94): 1-channel gates softmaxed over the two branches.

TPU-first choices: the reference's dynamic ``max(#conf>thres, 500)`` query
count becomes a static ``num_queries`` (500); sampling is the shared
bilinear gather used by the DSA adapter; all loops are over static heads /
levels so XLA sees fixed shapes.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from airv2x_tpu.models.fusion.adapter import _bilinear_sample_points


class Decoupling(nn.Module):
    """stcformer.py:96-130 — exclusive/common split of neighbour features."""

    exclusive_thre: float = 0.01
    common_thre: float = 0.01

    def __call__(self, feat, conf):
        """feat (B, L, H, W, C), conf (B, L, H, W, 1) sigmoid confidences ->
        (exclusive, common, exclusive_map, common_map); slot 0 (ego) passes
        its own confidence through both maps unchanged."""
        ego_conf = conf[:, :1]
        exc_map = (1.0 - ego_conf) * conf
        com_map = ego_conf * conf
        exc_map = exc_map.at[:, 0].set(ego_conf[:, 0])
        com_map = com_map.at[:, 0].set(ego_conf[:, 0])
        exc = feat * (exc_map > self.exclusive_thre).astype(feat.dtype)
        com = feat * (com_map > self.common_thre).astype(feat.dtype)
        exc = exc.at[:, 0].set(feat[:, 0])
        com = com.at[:, 0].set(feat[:, 0])
        return exc, com, exc_map, com_map


class TemporalAttention(nn.Module):
    """stcformer.py:25-77 — ego-query attention over history frames with
    globally pooled temporal key/value modulation."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hist):
        """hist (B, T, H, W, C) with index 0 = current ego -> (B, H, W, C)."""
        b, t, h, w, c = hist.shape
        hd = 2 * self.channels
        q = nn.Conv(hd, (3, 3), padding="SAME", dtype=self.dtype)(hist[:, 0])
        k = nn.Conv(hd, (3, 3), padding="SAME", dtype=self.dtype)(
            hist.reshape(b * t, h, w, c)
        )
        v = nn.Conv(hd, (3, 3), padding="SAME", dtype=self.dtype)(
            hist.reshape(b * t, h, w, c)
        )
        # channel-pooled temporal gates (the reference's AdaptiveAvgPool +
        # 1x1 Conv1d over frames)
        k_avg = k.reshape(b, t, h * w, hd).mean(axis=2)
        v_avg = v.reshape(b, t, h * w, hd).mean(axis=2)
        k_gate = nn.Dense(hd, dtype=self.dtype, name="temporal_key")(k_avg)
        v_gate = nn.Dense(hd, dtype=self.dtype, name="temporal_value")(v_avg)
        k = k.reshape(b, t, h, w, hd) * k_gate[:, :, None, None]
        v = v.reshape(b, t, h, w, hd) * v_gate[:, :, None, None]

        score = jnp.einsum("bhwc,bthwc->bthw", q, k) / jnp.sqrt(
            jnp.asarray(hd, jnp.float32)
        ).astype(q.dtype)
        attn = jax.nn.softmax(score, axis=1)
        out = jnp.einsum("bthw,bthwc->bhwc", attn, v)
        return nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype)(out)


class DeformableQueryRefine(nn.Module):
    """how2comm_deformable_transformer.py:430-524 — top-K confident cells
    deformably attend over all agents' maps, refined features scattered back
    into the ego map."""

    channels: int
    num_queries: int = 500
    heads: int = 8
    n_points: int = 4
    mlp_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, conf_maps):
        """feats (B, L, H, W, C); conf_maps (B, L, H, W, 1) -> (B, H, W, C)."""
        b, l, h, w, c = feats.shape
        nh, npt, nq = self.heads, self.n_points, self.num_queries
        dh = c // nh

        # query selection: summed confidence over agents (:463-472)
        score = conf_maps.sum(axis=1)[..., 0].reshape(b, h * w)
        _, order = jax.lax.top_k(score, nq)  # (B, nq)

        ego = feats[:, 0].reshape(b, h * w, c)
        queries = jnp.take_along_axis(ego, order[..., None], axis=1)  # (B,nq,C)

        # normalized cell centers -> learned positional embedding (:484-488)
        y_coor = (order // w).astype(jnp.float32) / h
        x_coor = (order % w).astype(jnp.float32) / w
        pos = jnp.stack([x_coor, y_coor], axis=-1)
        q = queries + nn.Dense(c, dtype=self.dtype, name="pos_embedding")(
            pos.astype(self.dtype)
        )

        # deformable attention over L agent levels
        offsets = nn.Dense(
            nh * l * npt * 2, kernel_init=nn.initializers.zeros, dtype=self.dtype
        )(q).reshape(b, nq, nh, l, npt, 2)
        weights = nn.Dense(
            nh * l * npt, kernel_init=nn.initializers.zeros, dtype=self.dtype
        )(q).reshape(b, nq, nh, l * npt)
        weights = jax.nn.softmax(weights, axis=-1).reshape(b, nq, nh, l, npt)

        value = nn.Dense(c, dtype=self.dtype, name="value_proj")(feats)
        value = value.reshape(b, l, h, w, nh, dh)
        norm = jnp.asarray([w, h], self.dtype)
        ref = pos[:, :, None, None, None, :]  # (B, nq, 1, 1, 1, 2)
        locs = ref + offsets / norm  # (B, nq, nh, l, npt, 2)

        per_head = []
        for head in range(nh):
            per_level = []
            for lev in range(l):
                s = _bilinear_sample_points(
                    value[:, lev, :, :, head, :], locs[:, :, head, lev]
                )  # (B, nq, npt, dh)
                per_level.append(
                    jnp.sum(s * weights[:, :, head, lev, :, None], axis=2)
                )
            per_head.append(sum(per_level))
        attended = jnp.concatenate(per_head, axis=-1)  # (B, nq, C)
        out = nn.Dense(c, dtype=self.dtype, name="output_proj")(attended)
        q = queries + out

        # FFN (Deform_Transformer mlp block)
        y = nn.LayerNorm(dtype=self.dtype)(q)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(c, dtype=self.dtype)(y)
        q = q + y

        # scatter refined queries back into the ego map (:519-523)
        refined = jax.vmap(lambda e, o, v: e.at[o].set(v))(ego, order, q)
        return refined.reshape(b, h, w, c)


class LateFusion(nn.Module):
    """stcformer.py:79-94 — gated blend of exclusive/common branches."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, exc, com):
        g1 = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype)(exc)
        g2 = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype)(com)
        wts = jax.nn.softmax(jnp.concatenate([g1, g2], axis=-1), axis=-1)
        return wts[..., :1] * exc + wts[..., 1:] * com


class STCFusion(nn.Module):
    """stcformer.py STCFormer (:148-205): decoupling + temporal attention +
    dual deformable encoders + late fusion, single scale."""

    channels: int
    num_queries: int = 500
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cur_feats, conf, ego_hist, train: bool = False):
        """cur_feats (B, L, H, W, C) current-frame agent features;
        conf (B, L, H, W, 1) sigmoid confidences; ego_hist (B, T, H, W, C)
        ego history (index 0 = current) -> (B, H, W, C)."""
        exc, com, exc_map, com_map = Decoupling()(cur_feats, conf)

        t = ego_hist.shape[1]
        delay = jnp.concatenate(
            [jnp.zeros((1,), self.dtype), -jnp.ones((t - 1,), self.dtype)]
        )
        time_embed = nn.Dense(self.channels, dtype=self.dtype, name="time_embedding")(
            delay[:, None]
        )
        hist = ego_hist + time_embed[None, :, None, None, :]
        ego = TemporalAttention(channels=self.channels, dtype=self.dtype)(hist)

        exc = exc.at[:, 0].set(ego)
        com = com.at[:, 0].set(ego)
        ego_exc = DeformableQueryRefine(
            channels=self.channels,
            num_queries=self.num_queries,
            n_points=9,
            dtype=self.dtype,
            name="exclusive_encoder",
        )(exc, exc_map)
        ego_com = DeformableQueryRefine(
            channels=self.channels,
            num_queries=self.num_queries,
            n_points=3,
            dtype=self.dtype,
            name="common_encoder",
        )(com, com_map)
        return LateFusion(dtype=self.dtype)(ego_exc, ego_com)
