"""MDD: radar-conditioned diffusion denoising of LiDAR BEV features.

Capability twin of mdd_modules/ (radar_cond_diff_denoise.Cond_Diff_Denoise
:248+ with its cross-attention Denosier :177): degraded LiDAR BEV features
are treated as a noisy diffusion state; a denoiser conditioned on the radar
BEV features (cross-attention over pooled tokens + timestep embedding)
predicts the clean features. Training uses the standard eps-prediction MSE;
inference runs a short deterministic (DDIM-style) denoise chain — fixed
step count, jit-static.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def timestep_embedding(t, dim: int, max_period: float = 10000.0):
    """Sinusoidal timestep embedding (mdd_modules/unet.py:11-29)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    ang = t.astype(jnp.float32)[..., None] * freqs
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def make_beta_schedule(num_steps: int, beta_start=1e-4, beta_end=2e-2):
    betas = np.linspace(beta_start, beta_end, num_steps, dtype=np.float32)
    alphas = 1.0 - betas
    return betas, np.cumprod(alphas)


class CrossCondBlock(nn.Module):
    """Conv block modulated by timestep + radar cross-attention
    (radar_cond_diff_denoise.CrossBlock twin)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond_tokens, t_emb):
        # x: (B, H, W, C); cond_tokens: (B, N, C); t_emb: (B, C)
        h = nn.GroupNorm(num_groups=8, dtype=self.dtype)(x)
        h = nn.swish(h)
        h = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype)(h)
        h = h + nn.Dense(self.channels, dtype=self.dtype)(t_emb)[:, None, None, :]

        # cross-attention: BEV pixels query radar tokens
        b, hh, ww, c = h.shape
        q = nn.Dense(c, dtype=self.dtype)(h).reshape(b, hh * ww, c)
        k = nn.Dense(c, dtype=self.dtype)(cond_tokens)
        v = nn.Dense(c, dtype=self.dtype)(cond_tokens)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k) / jnp.sqrt(jnp.asarray(c, q.dtype)),
            axis=-1,
        )
        h = h + jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, hh, ww, c)

        h = nn.GroupNorm(num_groups=8, dtype=self.dtype)(h)
        h = nn.swish(h)
        h = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype)(h)
        return x + h


class RadarCondDenoiser(nn.Module):
    """eps-prediction UNet denoiser conditioned on radar features
    (mdd_modules/unet.DiffusionUNet twin): two strided down levels, a
    cross-conditioned bottleneck, and skip-connected up levels; every level
    gets a timestep+radar CrossCondBlock."""

    channels: int
    depth: int = 2  # cross blocks per level
    cond_tokens: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_noisy, radar_bev, t):
        c = self.channels
        t_emb = nn.Dense(c, dtype=self.dtype)(
            nn.swish(nn.Dense(c, dtype=self.dtype)(timestep_embedding(t, c)))
        )
        # pool radar into a token set (adaptive grid pooling)
        b, h, w, rc = radar_bev.shape
        g = int(math.sqrt(self.cond_tokens))
        tokens = jax.image.resize(radar_bev, (b, g, g, rc), "bilinear")
        tokens = nn.Dense(c, dtype=self.dtype)(tokens.reshape(b, g * g, rc))

        h0 = nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype)(x_noisy)
        h0 = CrossCondBlock(c, dtype=self.dtype)(h0, tokens, t_emb)

        h1 = nn.Conv(c, (3, 3), strides=(2, 2), padding="SAME",
                     dtype=self.dtype)(h0)
        h1 = CrossCondBlock(c, dtype=self.dtype)(h1, tokens, t_emb)

        mid = nn.Conv(c, (3, 3), strides=(2, 2), padding="SAME",
                      dtype=self.dtype)(h1)
        for _ in range(self.depth):
            mid = CrossCondBlock(c, dtype=self.dtype)(mid, tokens, t_emb)

        u1 = nn.ConvTranspose(c, (2, 2), strides=(2, 2), dtype=self.dtype)(mid)
        u1 = CrossCondBlock(c, dtype=self.dtype)(
            nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype)(
                jnp.concatenate([u1, h1], axis=-1)
            ),
            tokens,
            t_emb,
        )
        u0 = nn.ConvTranspose(c, (2, 2), strides=(2, 2), dtype=self.dtype)(u1)
        u0 = CrossCondBlock(c, dtype=self.dtype)(
            nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype)(
                jnp.concatenate([u0, h0], axis=-1)
            ),
            tokens,
            t_emb,
        )
        return nn.Conv(x_noisy.shape[-1], (3, 3), padding="SAME",
                       dtype=self.dtype)(u0)


class CondDiffDenoise(nn.Module):
    """Denoising wrapper (Cond_Diff_Denoise twin).

    train: returns (denoised features, eps-MSE diffusion loss term);
    eval: runs ``infer_steps`` deterministic denoise steps.
    """

    channels: int
    num_train_steps: int = 100
    infer_steps: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lidar_bev, radar_bev, train: bool = False, rng=None):
        betas, alpha_bar = make_beta_schedule(self.num_train_steps)
        alpha_bar = jnp.asarray(alpha_bar)
        denoiser = RadarCondDenoiser(self.channels, dtype=self.dtype)

        if train:
            if rng is None:
                rng = self.make_rng("diffusion")
            rt, rn = jax.random.split(rng)
            b = lidar_bev.shape[0]
            t = jax.random.randint(rt, (b,), 0, self.num_train_steps)
            eps = jax.random.normal(rn, lidar_bev.shape, lidar_bev.dtype)
            ab = alpha_bar[t][:, None, None, None].astype(lidar_bev.dtype)
            x_noisy = jnp.sqrt(ab) * lidar_bev + jnp.sqrt(1 - ab) * eps
            eps_hat = denoiser(x_noisy, radar_bev, t)
            diff_loss = jnp.mean((eps_hat - eps) ** 2)
            denoised = (x_noisy - jnp.sqrt(1 - ab) * eps_hat) / jnp.sqrt(ab)
            return denoised, diff_loss

        # eval: treat input features as the noisy state at a mid timestep and
        # run a short deterministic chain
        x = lidar_bev
        b = x.shape[0]
        step_ts = np.linspace(
            self.num_train_steps // 2, 0, self.infer_steps, endpoint=False
        ).astype(np.int32)
        for ti in step_ts:
            t = jnp.full((b,), int(ti), jnp.int32)
            ab = alpha_bar[int(ti)].astype(x.dtype)
            eps_hat = denoiser(x, radar_bev, t)
            x0 = (x - jnp.sqrt(1 - ab) * eps_hat) / jnp.sqrt(ab)
            ab_prev = alpha_bar[max(int(ti) - self.num_train_steps
                                    // self.infer_steps, 0)].astype(x.dtype)
            x = jnp.sqrt(ab_prev) * x0 + jnp.sqrt(1 - ab_prev) * eps_hat
        return x, jnp.asarray(0.0)
