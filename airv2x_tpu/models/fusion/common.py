"""Fusion building blocks over the dense agent axis.

The reference plumbs ragged per-sample agent groups with ``record_len`` +
``tensor_split`` + pad/regroup (fuse_modules/fuse_utils.py:13-63,
fusion_in_one.py:49-88). Here the agent axis is a fixed dense dimension L
with a boolean mask: every fusion op is a masked einsum/attention —
shape-static, batched, and MXU-friendly.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

NEG_INF = -1e9


def masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray, axis: int):
    """Softmax along ``axis`` with False positions excluded."""
    scores = jnp.where(mask, scores, NEG_INF)
    scores = scores - jnp.max(scores, axis=axis, keepdims=True)
    w = jnp.exp(scores) * mask.astype(scores.dtype)
    return w / jnp.maximum(jnp.sum(w, axis=axis, keepdims=True), 1e-9)


def ego_agent_attention(x: jnp.ndarray, agent_mask: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel scaled-dot attention from the ego agent over all agents.

    Equivalent to the reference's AttentionFusion (where2comm_fuse.py:152-164)
    which runs (L, L) self-attention per pixel and keeps the ego row —
    computed here directly for the ego query only (L x cheaper).

    x: (B, L, H, W, C); agent_mask: (B, L) -> (B, H, W, C)
    """
    c = x.shape[-1]
    ego = x[:, 0]  # (B, H, W, C)
    scores = jnp.einsum("bhwc,blhwc->blhw", ego, x) / jnp.sqrt(
        jnp.asarray(c, x.dtype)
    )
    attn = masked_softmax(scores, agent_mask[:, :, None, None], axis=1)
    return jnp.einsum("blhw,blhwc->bhwc", attn, x)


def max_fusion(x: jnp.ndarray, agent_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked elementwise max over agents (fusion_in_one.MaxFusion :90)."""
    neg = jnp.asarray(NEG_INF, x.dtype)
    xm = jnp.where(agent_mask[:, :, None, None, None], x, neg)
    out = jnp.max(xm, axis=1)
    return jnp.where(out <= neg / 2, 0.0, out)


def mean_fusion(x: jnp.ndarray, agent_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean over agents."""
    m = agent_mask[:, :, None, None, None].astype(x.dtype)
    return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)


class PixelwiseSelfAttentionFusion(nn.Module):
    """Full (L, L) per-pixel self-attention fusion returning all agent rows.

    Used where the reference keeps per-agent outputs (AttFusion variants).
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, agent_mask):
        c = x.shape[-1]
        scores = jnp.einsum("bkhwc,blhwc->bklhw", x, x) / jnp.sqrt(
            jnp.asarray(c, x.dtype)
        )
        attn = masked_softmax(scores, agent_mask[:, None, :, None, None], axis=2)
        return jnp.einsum("bklhw,blhwc->bkhwc", attn, x)
