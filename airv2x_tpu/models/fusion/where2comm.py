"""Where2comm fusion: confidence-gated communication + per-pixel attention.

Behavioural twin of where2comm_modules/where2comm_fuse.py:48-287, dense-agent
formulation:

  * Communication (:48-149): sigmoid confidence -> max over anchor/class
    channels -> fixed 5x5 gaussian smoothing -> binary mask. Training uses
    the official random-top-K proxy objective (a uniformly random fraction u
    of pixels kept, by confidence rank) — implemented as a per-agent
    rank-threshold so K stays traced-friendly. Eval thresholds at a fixed
    confidence. The ego agent's mask is always 1.
  * Multi-scale fusion (:214-263): re-runs the (shared) backbone stages on
    masked features, fusing agents with ego-query attention at every scale,
    then deconvs + concatenates.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from airv2x_tpu.models.fusion.common import ego_agent_attention


def _gaussian_kernel(k_size: int, sigma: float) -> np.ndarray:
    half = k_size // 2
    x, y = np.mgrid[-half : k_size - half, -half : k_size - half]
    g = 1.0 / (2 * np.pi * sigma) * np.exp(-(x**2 + y**2) / (2 * sigma**2))
    return g.astype(np.float32)


def gaussian_smooth(conf: jnp.ndarray, k_size: int, sigma: float) -> jnp.ndarray:
    """Fixed (non-learned) gaussian blur of (..., H, W) confidence maps.

    The reference loads the same unnormalized gaussian into a frozen conv
    (where2comm_fuse.py:66-81).
    """
    kern = jnp.asarray(_gaussian_kernel(k_size, sigma), conf.dtype)
    lead = conf.shape[:-2]
    x = conf.reshape((-1, conf.shape[-2], conf.shape[-1], 1))
    out = jax.lax.conv_general_dilated(
        x,
        kern[:, :, None, None],
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out[..., 0].reshape(lead + conf.shape[-2:])


class Communication(nn.Module):
    threshold: float = 0.01
    smooth: bool = True
    k_size: int = 5
    c_sigma: float = 1.0

    @nn.compact
    def __call__(self, psm, agent_mask, *, train: bool, rng=None,
                 thres_map=None):
        """psm: (B, L, H, W, AC) confidence logits -> (mask (B, L, H, W),
        comm_rate scalar). ``thres_map`` (B, L, H, W) overrides the scalar
        eval threshold per pixel (BM2CP's modality-aware threshold,
        bm2cp_modules/attentioncomm.py)."""
        b, l, h, w, _ = psm.shape
        # The comm mask is decided by ranks/thresholds — no gradient flows
        # through it mathematically. stop_gradient makes that explicit and
        # avoids an XLA TPU backward-pass crash (SIGABRT in the HLO pass
        # pipeline) triggered by differentiating the mask chain inside the
        # multi-scale seg graph.
        psm = jax.lax.stop_gradient(psm)
        conf = jnp.max(jax.nn.sigmoid(psm), axis=-1)  # (B, L, H, W)
        if self.smooth:
            conf = gaussian_smooth(conf, self.k_size, self.c_sigma)

        if train:
            if rng is None:
                rng = self.make_rng("comm")
            u = jax.random.uniform(rng, (b,))  # kept fraction per sample
            k = jnp.floor(u * (h * w)).astype(jnp.int32)  # (B,)
            flat = conf.reshape(b, l, h * w)
            # pixel kept iff its rank among this agent's confidences < k:
            # rank via double argsort (descending).
            order = jnp.argsort(-flat, axis=-1)
            ranks = jnp.argsort(order, axis=-1)
            comm_mask = (ranks < k[:, None, None]).astype(conf.dtype)
            comm_mask = comm_mask.reshape(b, l, h, w)
        else:
            thr = self.threshold if thres_map is None else thres_map
            comm_mask = (conf > thr).astype(conf.dtype)

        # rate is measured BEFORE the ego row is forced on
        # (where2comm_fuse.py:139-146 computes communication_rate, then sets
        # communication_mask[0] = 1)
        am = agent_mask[:, :, None, None].astype(conf.dtype)
        rate = jnp.sum(comm_mask * am) / jnp.maximum(jnp.sum(am) * h * w, 1.0)
        # ego always communicates with itself
        comm_mask = comm_mask.at[:, 0].set(1.0)
        return comm_mask, rate


class MultiHeadAgentAttention(nn.Module):
    """Projected multi-head per-pixel agent attention (twin of the
    where2comm_attn.py variant's attention block — the plain path uses the
    unprojected ego-query attention of fusion/common.py)."""

    dim: int
    heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, agent_mask):
        # x: (B, L, H, W, C) -> (B, H, W, C) at the ego query
        from airv2x_tpu.models.fusion.common import masked_softmax

        c = self.dim
        if c % self.heads:
            raise ValueError(
                f"where2com_fusion.attn_heads={self.heads} must divide the "
                f"feature dim {c} at every fused scale"
            )
        dh = c // self.heads
        qkv = nn.Dense(3 * c, use_bias=False, dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            b, l, h, w, _ = t.shape
            return t.reshape(b, l, h, w, self.heads, dh)

        q, k, v = map(split, (q, k, v))
        scores = jnp.einsum("bhwmc,blhwmc->blhwm", q[:, 0], k) / jnp.sqrt(
            jnp.asarray(dh, x.dtype)
        )
        attn = masked_softmax(scores, agent_mask[:, :, None, None, None], axis=1)
        out = jnp.einsum("blhwm,blhwmc->bhwmc", attn, v)
        b, h, w = out.shape[:3]
        return nn.Dense(c, dtype=self.dtype)(out.reshape(b, h, w, c))


class Where2commFusion(nn.Module):
    """Multi-scale (or single-scale) confidence-gated attention fusion.

    Call with the shared backbone module so stage weights are reused, exactly
    like the reference passes ``self.backbone`` into the fusion net.
    ``attn_heads > 0`` switches the per-pixel fusion to the projected
    multi-head variant (where2comm_attn.py twin).
    """

    multi_scale: bool = True
    fully: bool = False
    threshold: float = 0.01
    smooth: bool = True
    k_size: int = 5
    c_sigma: float = 1.0
    attn_heads: int = 0
    dtype: Any = jnp.float32

    def _fuse(self, grouped, agent_mask, name):
        if self.attn_heads > 0:
            return MultiHeadAgentAttention(
                dim=grouped.shape[-1],
                heads=self.attn_heads,
                dtype=self.dtype,
                name=name,
            )(grouped, agent_mask)
        return ego_agent_attention(grouped, agent_mask)

    @nn.compact
    def __call__(self, x, psm, agent_mask, backbone=None, train: bool = False):
        """x: (B, L, H, W, C) raw BEV features (multi_scale) or 2d features;
        psm: (B, L, H', W', AC) single-agent confidence logits.

        Returns (fused (B, Hf, Wf, Cf), comm_rate).
        """
        b, l = x.shape[:2]

        if self.fully:
            comm_mask, rate = jnp.ones(x.shape[:4], x.dtype), jnp.asarray(1.0)
        else:
            comm_mask, rate = Communication(
                threshold=self.threshold,
                smooth=self.smooth,
                k_size=self.k_size,
                c_sigma=self.c_sigma,
                name="communication",
            )(psm, agent_mask, train=train)

        if self.multi_scale:
            assert backbone is not None
            ups = []
            cur = x.reshape((b * l,) + x.shape[2:])
            for i in range(len(backbone.stages)):
                cur = backbone.stage(i, cur, train)
                if i == 0:
                    m = comm_mask
                    if m.shape[-2:] != cur.shape[1:3]:
                        m = jax.image.resize(
                            m, m.shape[:2] + cur.shape[1:3], method="bilinear"
                        )
                    cur = cur * m.reshape((b * l,) + cur.shape[1:3] + (1,))
                grouped = cur.reshape((b, l) + cur.shape[1:])
                fused = self._fuse(grouped, agent_mask, f"attn_{i}")
                ups.append(backbone.deblock(i, fused, train))
            fused = backbone.finish(ups, train)
        else:
            m = comm_mask
            if m.shape[-2:] != x.shape[2:4]:
                m = jax.image.resize(m, m.shape[:2] + x.shape[2:4], "bilinear")
            gated = x * m[..., None]
            fused = self._fuse(gated, agent_mask, "attn")

        return fused, rate
