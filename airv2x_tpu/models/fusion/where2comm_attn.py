"""Attn-variant Where2comm fusion (flax twin of
where2comm_modules/where2comm_attn.py + where2comm_modules/where2comm.py's
Communication), used by point_pillar_where2comm_bm2cp.

Structure (where2comm_attn.Where2comm.forward :266-404): confidence-mask
communication at level 0 (same even-slot quirk as SCOPE's), per-level
ego-warp, per-level fusion in one of three agg modes — per-pixel agent
self-attention (ATTEN, shared with fusion/scope.py), MAX, or a pixel-wise
multi-head Transformer layer over the agent axis with an optional sincos
positional-encoding map (``with_spe``; the ``with_scm`` quality-map path
passes an argument torch's MultiheadAttention does not accept and crashes
upstream — unsupported here, documented).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sincos_pe_map(h: int, w: int, c: int) -> np.ndarray:
    """where2comm_attn.add_pe_map (:175-215): DETR-style 2d sincos map,
    (H, W, C) with the y-encoding in the first C/2 channels."""
    num_pos = c // 2
    y_embed = np.arange(1, h + 1, dtype=np.float32)[:, None] * np.ones(
        (1, w), np.float32
    )
    x_embed = np.ones((h, 1), np.float32) * np.arange(
        1, w + 1, dtype=np.float32
    )[None, :]
    dim_t = np.arange(num_pos, dtype=np.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / num_pos)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])],
                     axis=3).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])],
                     axis=3).reshape(h, w, -1)
    return np.concatenate([pos_y, pos_x], axis=2)


class EncodeLayer(nn.Module):
    """where2comm_attn.EncodeLayer (:79-118): torch MultiheadAttention
    (packed qkv projection) + 2-linear FFN with pre-residual LayerNorms."""

    channels: int
    n_head: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, key_mask=None):
        """q (B, P, 1, C), k/v (B, P, L, C); key_mask (B, L) excludes
        padded agent slots from the softmax."""
        c, heads = self.channels, self.n_head
        dh = c // heads
        qkv_w = self.param(
            "in_proj_weight", nn.initializers.lecun_normal(), (3 * c, c)
        ).astype(self.dtype)
        qkv_b = self.param(
            "in_proj_bias", nn.initializers.zeros, (3 * c,)
        ).astype(self.dtype)
        wq, wk, wv = jnp.split(qkv_w, 3, axis=0)
        bq, bk, bv = jnp.split(qkv_b, 3, axis=0)

        qh = (q @ wq.T + bq).reshape(q.shape[:-1] + (heads, dh))
        kh = (k @ wk.T + bk).reshape(k.shape[:-1] + (heads, dh))
        vh = (v @ wv.T + bv).reshape(v.shape[:-1] + (heads, dh))
        score = jnp.einsum("bpqhd,bplhd->bphql", qh, kh) / jnp.sqrt(
            jnp.asarray(dh, jnp.float32)
        )
        if key_mask is not None:
            score = jnp.where(
                key_mask[:, None, None, None, :].astype(bool), score,
                jnp.asarray(-1e9, score.dtype),
            )
        attn = jax.nn.softmax(score, axis=-1)
        ctx = jnp.einsum("bphql,bplhd->bpqhd", attn, vh)
        ctx = ctx.reshape(q.shape)
        ctx = nn.Dense(c, dtype=self.dtype, name="out_proj")(ctx)

        out1 = nn.LayerNorm(dtype=self.dtype, name="norm1")(q + ctx)
        ffn = nn.Dense(c, dtype=self.dtype, name="linear2")(
            nn.relu(nn.Dense(c, dtype=self.dtype, name="linear1")(out1))
        )
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(out1 + ffn)


class TransformerFusion(nn.Module):
    """where2comm_attn.TransformerFusion (:120-173): pixel-wise ego-query
    multi-head attention over the (warped) agent slot axis."""

    channels: int
    n_head: int = 8
    with_spe: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, agent_mask):
        """x (B, L, H, W, C) warped slot maps -> (B, H, W, C)."""
        b, l, h, w, c = x.shape
        flat = x.transpose(0, 2, 3, 1, 4).reshape(b, h * w, l, c)
        if self.with_spe:
            pe = jnp.asarray(sincos_pe_map(h, w, c), x.dtype)
            flat_pe = (x + pe[None, None]).transpose(0, 2, 3, 1, 4).reshape(
                b, h * w, l, c
            )
            q, k = flat_pe[:, :, :1], flat_pe
        else:
            q, k = flat[:, :, :1], flat
        out = EncodeLayer(
            channels=c, n_head=self.n_head, dtype=self.dtype,
            name="encode_layer",
        )(q, k, flat, agent_mask)
        return out[:, :, 0].reshape(b, h, w, c)
