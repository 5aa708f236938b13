"""CoBEVT fused-axial fusion (swap attention over agents x local windows).

Behavioural twin of cobevt_modules/swap_fusion_modules.py: each block runs
joint attention over (agent, window_h, window_w) tokens with a 3D relative
position bias — first on contiguous windows ("window attention"), then on
strided grids ("grid attention") — followed by a mean-over-agents MLP head.

Layout here is channel-last (B, L, H, W, C); the agent mask folds into the
attention mask exactly like SwapFusionBlockMask.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from airv2x_tpu.models.fusion.common import NEG_INF


def _relative_position_index(agent_size: int, ws: int) -> np.ndarray:
    """(N, N) index into the (2L-1)(2ws-1)(2ws-1) bias table, N = L*ws*ws."""
    coords = np.stack(
        np.meshgrid(
            np.arange(agent_size), np.arange(ws), np.arange(ws), indexing="ij"
        )
    ).reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += agent_size - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 2] += ws - 1
    rel[:, :, 0] *= (2 * ws - 1) * (2 * ws - 1)
    rel[:, :, 1] *= 2 * ws - 1
    return rel.sum(-1)


class WindowedAgentAttention(nn.Module):
    """Joint attention over (L, ws, ws) tokens per window location."""

    dim: int
    dim_head: int
    agent_size: int
    window_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        # x: (B, L, nx, ny, w1, w2, C); mask: (B, nx, ny, w1, w2, L) or None
        b, l, nx, ny, w1, w2, d = x.shape
        heads = self.dim // self.dim_head
        n = l * w1 * w2

        tokens = x.transpose(0, 2, 3, 1, 4, 5, 6).reshape(b * nx * ny, n, d)
        qkv = nn.Dense(self.dim * 3, use_bias=False, dtype=self.dtype)(tokens)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(t.shape[0], n, heads, self.dim_head).transpose(
                0, 2, 1, 3
            )

        q, k, v = map(split_heads, (q, k, v))
        sim = jnp.einsum("bhic,bhjc->bhij", q * (self.dim_head**-0.5), k)

        table_size = (
            (2 * self.agent_size - 1)
            * (2 * self.window_size - 1)
            * (2 * self.window_size - 1)
        )
        bias_table = self.param(
            "relative_position_bias",
            nn.initializers.normal(0.02),
            (table_size, heads),
        )
        idx = _relative_position_index(self.agent_size, self.window_size)
        bias = bias_table[jnp.asarray(idx)]  # (N, N, heads)
        sim = sim + bias.transpose(2, 0, 1).astype(sim.dtype)

        if mask is not None:
            m = mask.transpose(0, 1, 2, 5, 3, 4).reshape(b * nx * ny, 1, 1, n)
            sim = jnp.where(m > 0, sim, NEG_INF)

        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bhjc->bhic", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b * nx * ny, n, self.dim)
        out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype)(out)
        out = out.reshape(b, nx, ny, l, w1, w2, self.dim).transpose(
            0, 3, 1, 2, 4, 5, 6
        )
        return out


class _FeedForward(nn.Module):
    dim: int
    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.hidden, dtype=self.dtype)(x)
        y = nn.gelu(y)
        return nn.Dense(self.dim, dtype=self.dtype)(y)


class SwapFusionBlock(nn.Module):
    """window attention -> FF -> grid attention -> FF, all pre-norm residual."""

    input_dim: int
    mlp_dim: int
    dim_head: int
    window_size: int
    agent_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        # x: (B, L, H, W, C); mask: (B, H, W, L) or None
        ws = self.window_size
        b, l, h, w, c = x.shape
        nx, ny = h // ws, w // ws

        def window_split(t, grid: bool):
            # contiguous windows vs strided grid
            if not grid:
                t = t.reshape(b, l, nx, ws, ny, ws, c)
                return t.transpose(0, 1, 2, 4, 3, 5, 6)
            t = t.reshape(b, l, ws, nx, ws, ny, c)
            return t.transpose(0, 1, 3, 5, 2, 4, 6)

        def window_merge(t, grid: bool):
            if not grid:
                t = t.transpose(0, 1, 2, 4, 3, 5, 6)
                return t.reshape(b, l, h, w, c)
            t = t.transpose(0, 1, 4, 2, 5, 3, 6)
            return t.reshape(b, l, h, w, c)

        def mask_split(m, grid: bool):
            if m is None:
                return None
            if not grid:
                mm = m.reshape(b, nx, ws, ny, ws, l)
                return mm.transpose(0, 1, 3, 2, 4, 5)
            mm = m.reshape(b, ws, nx, ws, ny, l)
            return mm.transpose(0, 2, 4, 1, 3, 5)

        for grid in (False, True):
            xw = window_split(x, grid)
            mw = mask_split(mask, grid)
            attn = WindowedAgentAttention(
                self.input_dim,
                self.dim_head,
                self.agent_size,
                ws,
                dtype=self.dtype,
            )
            y = attn(nn.LayerNorm(dtype=self.dtype)(xw), mw)
            xw = xw + y
            y = _FeedForward(self.input_dim, self.mlp_dim, dtype=self.dtype)(
                nn.LayerNorm(dtype=self.dtype)(xw)
            )
            xw = xw + y
            x = window_merge(xw, grid)
        return x


class SwapFusionEncoder(nn.Module):
    """Twin of SwapFusionEncoder (:233-284): depth x SwapFusionBlock then a
    mean-over-agents LayerNorm+Linear head."""

    args: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, agent_mask, train: bool = False):
        # x: (B, L, H, W, C); agent_mask: (B, L)
        a = self.args
        h, w = x.shape[2], x.shape[3]
        mask = jnp.broadcast_to(
            agent_mask[:, None, None, :], (x.shape[0], h, w, x.shape[1])
        ).astype(x.dtype) if a.get("mask") else None

        for _ in range(a["depth"]):
            x = SwapFusionBlock(
                a["input_dim"],
                a["mlp_dim"],
                a["dim_head"],
                a["window_size"],
                a["agent_size"],
                dtype=self.dtype,
            )(x, mask)

        # plain mean over the L axis (reference Reduce 'b m d h w -> b d h w',
        # 'mean' — padded agents included), then LayerNorm + Linear
        pooled = jnp.mean(x, axis=1)
        pooled = nn.LayerNorm(dtype=self.dtype)(pooled)
        return nn.Dense(a["input_dim"], dtype=self.dtype)(pooled)
