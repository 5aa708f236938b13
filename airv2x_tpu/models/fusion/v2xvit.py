"""V2X-ViT fusion: STTF warp + heterogeneous agent attention + pyramid
window attention + RTE temporal encoding.

Behavioural twin of the reference v2xvit_modules/ (v2xvit_basic.py,
hmsa.py, mswin.py, split_attn.py, base_transformer.py), dense-agent layout
(B, L, H, W, C) with agent masks.

TPU re-formulation of HGT attention (hmsa.py:6-180): the reference
materializes per-pair relation tensors (B, M, H, W, L, L, c) — gigabytes at
BEV scale. Because there are only 2 node types (vehicle vs infra) and 4
relations with rel(i, j) = 2*t_i + t_j, the bilinear forms factor:

    S[i, j] = q_i W_{2t_i + t_j} k_j
            = [t_j = 0] (q_i W_{2t_i}) k_j + [t_j = 1] (q_i W_{2t_i+1}) k_j
    out_i   = W'_{2t_i} (sum_{j: t_j=0} a_ij v_j)
            + W'_{2t_i+1} (sum_{j: t_j=1} a_ij v_j)

so only O(L) projected tensors are ever materialized. A dense einsum
reference implementation is kept for small-shape equivalence tests.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from airv2x_tpu.models.fusion.common import NEG_INF
from airv2x_tpu.ops.warp import rotated_roi_mask, warp_bev_features


class STTF(nn.Module):
    """Spatio-temporal transform: warp non-ego BEV features into ego frame
    (v2xvit_basic.py:17-38)."""

    discrete_ratio: float
    downsample_rate: float

    def __call__(self, x, pairwise_t):
        return warp_bev_features(
            x, pairwise_t, self.discrete_ratio, self.downsample_rate
        )


class RTE(nn.Module):
    """Relative temporal encoding: sinusoidal table + learned linear
    (v2xvit_basic.py:41-80)."""

    dim: int
    rte_ratio: int = 2
    max_len: int = 100

    @nn.compact
    def __call__(self, x, dts):
        # x: (B, L, H, W, C); dts: (B, L) int time delays
        pos = np.arange(self.max_len, dtype=np.float32)[:, None]
        div = np.exp(
            np.arange(0, self.dim, 2, dtype=np.float32)
            * -(math.log(10000.0) / self.dim)
        )
        table = np.zeros((self.max_len, self.dim), np.float32)
        table[:, 0::2] = np.sin(pos * div) / math.sqrt(self.dim)
        table[:, 1::2] = np.cos(pos * div) / math.sqrt(self.dim)
        emb = jnp.asarray(table)[
            jnp.clip(dts * self.rte_ratio, 0, self.max_len - 1)
        ]  # (B, L, C)
        emb = nn.Dense(self.dim, name="lin")(emb)
        return x + emb[:, :, None, None, :].astype(x.dtype)


class CavAttention(nn.Module):
    """Vanilla per-pixel agent attention (base_transformer.py:31-80)."""

    dim: int
    heads: int
    dim_head: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, prior_encoding=None, types=None):
        # x: (B, L, H, W, C); mask: (B, H, W, L) float/bool
        inner = self.heads * self.dim_head
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_first(t):
            b, l, h, w, _ = t.shape
            return t.reshape(b, l, h, w, self.heads, self.dim_head)

        q, k, v = map(heads_first, (q, k, v))
        scores = jnp.einsum("bihwmc,bjhwmc->bmhwij", q, k) * (
            self.dim_head**-0.5
        )
        m = mask[:, None, :, :, None, :]  # (B, 1, H, W, 1, L)
        scores = jnp.where(m > 0, scores, NEG_INF)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bmhwij,bjhwmc->bihwmc", attn, v)
        b, l, h, w = out.shape[:4]
        out = out.reshape(b, l, h, w, inner)
        return nn.Dense(self.dim, dtype=self.dtype)(out)


class HGTCavAttention(nn.Module):
    """Heterogeneous (vehicle/infra) agent attention — factored formulation
    (see module docstring); twin of hmsa.HGTCavAttention."""

    dim: int
    heads: int
    dim_head: int
    num_types: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, prior_encoding=None, types=None):
        # x: (B, L, H, W, C); mask: (B, H, W, L); types: (B, L) in {0, 1}
        b, l, h, w, _ = x.shape
        inner = self.heads * self.dim_head
        nt = self.num_types

        def typed_dense(name):
            outs = [
                nn.Dense(inner, name=f"{name}_{t}", dtype=self.dtype)(x)
                for t in range(nt)
            ]
            stacked = jnp.stack(outs, axis=0)  # (T, B, L, H, W, inner)
            sel = jnp.take_along_axis(
                stacked,
                types[None, :, :, None, None, None].astype(jnp.int32),
                axis=0,
            )[0]
            return sel.reshape(b, l, h, w, self.heads, self.dim_head)

        q = typed_dense("q")
        k = typed_dense("k")
        v = typed_dense("v")

        w_att = self.param(
            "relation_att",
            nn.initializers.xavier_uniform(),
            (nt * nt, self.heads, self.dim_head, self.dim_head),
        ).astype(self.dtype)
        w_msg = self.param(
            "relation_msg",
            nn.initializers.xavier_uniform(),
            (nt * nt, self.heads, self.dim_head, self.dim_head),
        ).astype(self.dtype)

        # q_i projected by W_{2 t_i + tj} for tj in {0, 1}:
        # qw_all: (R, B, L, H, W, M, c) contracted lazily per tj.
        scale = self.dim_head**-0.5
        tj_onehot = jax.nn.one_hot(types, nt, dtype=x.dtype)  # (B, L, T)

        scores = 0.0
        msgs = []
        for tj in range(nt):
            # select W_{2 t_i + tj} per agent i
            rel_idx = types.astype(jnp.int32) * nt + tj  # (B, L)
            w_att_i = w_att[rel_idx]  # (B, L, M, c, c)
            qw = jnp.einsum("bihwmp,bimpq->bihwmq", q, w_att_i)
            s_tj = jnp.einsum("bihwmq,bjhwmq->bmhwij", qw, k) * scale
            # only columns j with type tj count
            scores = scores + s_tj * tj_onehot[:, None, None, None, None, :, tj]

        m = mask[:, None, :, :, None, :]  # (B, 1, H, W, 1, L)
        scores = jnp.where(m > 0, scores, NEG_INF)
        attn = jax.nn.softmax(scores, axis=-1)

        out = 0.0
        for tj in range(nt):
            vj = v * tj_onehot[:, :, None, None, None, tj][..., None]
            mix = jnp.einsum("bmhwij,bjhwmc->bihwmc", attn, vj)
            rel_idx = types.astype(jnp.int32) * nt + tj
            w_msg_i = w_msg[rel_idx]  # (B, L, M, c, c)
            out = out + jnp.einsum("bihwmp,bimpc->bihwmc", mix, w_msg_i)

        out = out.reshape(b, l, h, w, inner)
        outs = [
            nn.Dense(self.dim, name=f"a_{t}", dtype=self.dtype)(out)
            for t in range(nt)
        ]
        stacked = jnp.stack(outs, axis=0)
        return jnp.take_along_axis(
            stacked, types[None, :, :, None, None, None].astype(jnp.int32), axis=0
        )[0]


class BaseWindowAttention(nn.Module):
    """Windowed spatial self-attention per agent (mswin.py:21-100)."""

    dim: int
    heads: int
    dim_head: int
    window_size: int
    relative_pos_embedding: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, l, h, w, _ = x.shape
        ws = self.window_size
        inner = self.heads * self.dim_head
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        nh, nw = h // ws, w // ws

        def to_windows(t):
            t = t.reshape(b, l, nh, ws, nw, ws, self.heads, self.dim_head)
            return t.transpose(0, 1, 6, 2, 4, 3, 5, 7).reshape(
                b, l, self.heads, nh * nw, ws * ws, self.dim_head
            )

        q, k, v = map(to_windows, (q, k, v))
        dots = jnp.einsum("blmhic,blmhjc->blmhij", q, k) * (self.dim_head**-0.5)

        if self.relative_pos_embedding:
            idx = np.array(
                [[xx, yy] for xx in range(ws) for yy in range(ws)]
            )
            rel = idx[None, :, :] - idx[:, None, :] + ws - 1
            pos = self.param(
                "pos_embedding",
                nn.initializers.normal(1.0),
                (2 * ws - 1, 2 * ws - 1),
            )
            bias = pos[rel[..., 0], rel[..., 1]]
        else:
            bias = self.param(
                "pos_embedding", nn.initializers.normal(1.0), (ws * ws, ws * ws)
            )
        dots = dots + bias.astype(dots.dtype)

        attn = jax.nn.softmax(dots, axis=-1)
        out = jnp.einsum("blmhij,blmhjc->blmhic", attn, v)
        out = out.reshape(b, l, self.heads, nh, nw, ws, ws, self.dim_head)
        out = out.transpose(0, 1, 3, 5, 4, 6, 2, 7).reshape(b, l, h, w, inner)
        return nn.Dense(self.dim, dtype=self.dtype)(out)


class SplitAttn(nn.Module):
    """Radix-3 split attention over the window-pyramid outputs
    (split_attn.py:28-62)."""

    input_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, windows: Sequence[jnp.ndarray]):
        assert len(windows) == 3
        sw, mw, bw = windows
        gap = (sw + mw + bw).mean(axis=(2, 3), keepdims=True)  # (B, L, 1, 1, C)
        gap = nn.Dense(self.input_dim, use_bias=False, dtype=self.dtype)(gap)
        gap = nn.relu(nn.LayerNorm(dtype=self.dtype)(gap))
        attn = nn.Dense(self.input_dim * 3, use_bias=False, dtype=self.dtype)(gap)
        b, l = attn.shape[:2]
        attn = jax.nn.softmax(
            attn.reshape(b, l, 1, 3, self.input_dim), axis=3
        ).reshape(b, l, 1, 1, 3 * self.input_dim)
        c = self.input_dim
        return sw * attn[..., :c] + mw * attn[..., c : 2 * c] + bw * attn[..., 2 * c :]


class PyramidWindowAttention(nn.Module):
    dim: int
    heads: Sequence[int]
    dim_heads: Sequence[int]
    window_size: Sequence[int]
    relative_pos_embedding: bool = True
    fuse_method: str = "split_attn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = [
            BaseWindowAttention(
                self.dim,
                h,
                dh,
                ws,
                self.relative_pos_embedding,
                dtype=self.dtype,
            )(x)
            for h, dh, ws in zip(self.heads, self.dim_heads, self.window_size)
        ]
        if self.fuse_method == "naive":
            return sum(outs) / len(outs)
        return SplitAttn(self.dim, dtype=self.dtype)(outs)


class V2XFusionBlock(nn.Module):
    num_blocks: int
    cav_att_config: dict
    pwindow_config: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, prior_encoding, types):
        cav = self.cav_att_config
        pw = self.pwindow_config
        for _ in range(self.num_blocks):
            att_cls = HGTCavAttention if cav.get("use_hetero") else CavAttention
            att = att_cls(
                dim=cav["dim"],
                heads=cav["heads"],
                dim_head=cav["dim_head"],
                dtype=self.dtype,
            )
            xn = nn.LayerNorm(dtype=self.dtype)(x)
            x = att(xn, mask=mask, prior_encoding=prior_encoding, types=types) + x
            xn = nn.LayerNorm(dtype=self.dtype)(x)
            x = (
                PyramidWindowAttention(
                    pw["dim"],
                    heads=pw["heads"],
                    dim_heads=pw["dim_head"],
                    window_size=pw["window_size"],
                    relative_pos_embedding=pw["relative_pos_embedding"],
                    fuse_method=pw["fusion_method"],
                    dtype=self.dtype,
                )(xn)
                + x
            )
        return x


class V2XTEncoder(nn.Module):
    """Twin of v2xvit_basic.V2XTEncoder (:135-200)."""

    args: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, agent_mask, pairwise_t, prior_encoding, train=False):
        # x: (B, L, H, W, C); prior_encoding (B, L, 3): velocity, dt, infra
        cav = self.args["cav_att_config"]
        pw = self.args["pwindow_att_config"]
        feed = self.args["feed_forward"]
        sttf_args = self.args["sttf"]
        discrete_ratio = sttf_args["voxel_size"][0]
        downsample = sttf_args["downsample_rate"]

        dts = prior_encoding[..., 1].astype(jnp.int32)
        types = prior_encoding[..., 2].astype(jnp.int32)

        if cav.get("use_RTE"):
            x = RTE(cav["dim"], cav.get("RTE_ratio", 2))(x, dts)

        x = STTF(discrete_ratio, downsample)(x, pairwise_t)

        h, w = x.shape[2], x.shape[3]
        if self.args.get("use_roi_mask"):
            roi = rotated_roi_mask((h, w), pairwise_t, discrete_ratio, downsample)
            mask = roi & agent_mask[:, :, None, None]
            mask = mask.transpose(0, 2, 3, 1).astype(x.dtype)  # (B, H, W, L)
        else:
            mask = jnp.broadcast_to(
                agent_mask[:, None, None, :], (x.shape[0], h, w, x.shape[1])
            ).astype(x.dtype)

        for _ in range(self.args["depth"]):
            x = V2XFusionBlock(
                self.args["num_blocks"], cav, pw, dtype=self.dtype
            )(x, mask, prior_encoding, types)
            xn = nn.LayerNorm(dtype=self.dtype)(x)
            y = nn.Dense(feed["mlp_dim"], dtype=self.dtype)(xn)
            y = nn.gelu(y)
            y = nn.Dense(cav["dim"], dtype=self.dtype)(y)
            x = y + x
        return x


class V2XTransformer(nn.Module):
    args: dict  # the 'transformer' config block
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, agent_mask, pairwise_t, prior_encoding, train=False):
        out = V2XTEncoder(self.args["encoder"], dtype=self.dtype)(
            x, agent_mask, pairwise_t, prior_encoding, train
        )
        return out[:, 0]
