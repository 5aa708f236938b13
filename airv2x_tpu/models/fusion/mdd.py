"""MDD: radar-conditioned diffusion denoising of LiDAR BEV features.

Faithful flax twin of mdd_modules/ (V2X-R "Fusion with MDD" plugin):

* ``DiffusionUNet`` — mdd_modules/unet.py:184-339, the DDIM-style UNet the
  reference actually instantiates (radar_cond_diff_denoise.py:272; the
  cross-attention ``Denosier`` at :177 is dead code there). GroupNorm(4,
  eps=1e-6) + swish ResnetBlocks with timestep projection, 1x1-conv
  AttnBlocks at the configured resolutions, asymmetrically padded stride-2
  downsampling (unet.py:59-76) and nearest x2 upsampling (:43-56).
* ``CondDiffDenoise`` — radar_cond_diff_denoise.Cond_Diff_Denoise
  (:248-498): x0 parameterisation, "linear" beta schedule
  ``linspace(sqrt(5e-3), sqrt(5e-2), T)**2`` (the module HARDCODES
  linear_start/linear_end at :262-263, ignoring the yaml's
  beta_start/beta_end — quirk preserved), and the full reverse chain: the
  clean-signal estimate ``x_start`` (the degraded LiDAR BEV) is noised to
  t=T-1 via q_sample, then denoised step-by-step conditioned on the radar
  BEV (``gen_pred`` concatenates [radar, noisy] channel-wise, :424-426).
  Steps t>0 add posterior noise (:403-422); the final t=0 step returns the
  raw x0 prediction (``upsam=True``, :390-392). The reference's training
  branch (:453-478) runs the SAME chain per batch element — with GroupNorm
  (batch-independent) the batched chain is element-wise identical, so one
  implementation serves both modes. The reference's same-size
  ``F.interpolate`` calls (:394-396, :433-438) are identities and elided.

Checkpoint conversion: utils/torch_convert.convert_diffusion_unet maps the
torch parameter tree (down.{i}.block.{j}..., mid.block_1/2, up.{i}...)
onto this module's explicit flax names.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def get_timestep_embedding(t, embedding_dim: int):
    """Sinusoidal embedding, Fairseq convention (unet.py:11-29): note the
    ``(half_dim - 1)`` denominator and the [sin, cos] order (the DIT-style
    embedder in radar_cond_diff_denoise.py:58-80 uses [cos, sin])."""
    half = embedding_dim // 2
    emb = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _gn(name: str, dtype):
    # unet.py:37-40 Normalize: GroupNorm(4, eps=1e-6, affine=True)
    return nn.GroupNorm(num_groups=4, epsilon=1e-6, name=name, dtype=dtype)


class ResnetBlockDDIM(nn.Module):
    """unet.py:79-134 (norm-swish-conv ×2 with additive temb projection)."""

    out_channels: int
    dropout: float = 0.0
    conv_shortcut: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb, train: bool = False):
        in_ch = x.shape[-1]
        h = _gn("norm1", self.dtype)(x)
        h = _swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", name="conv1",
                    dtype=self.dtype)(h)
        h = h + nn.Dense(self.out_channels, name="temb_proj",
                         dtype=self.dtype)(_swish(temb))[:, None, None, :]
        h = _gn("norm2", self.dtype)(h)
        h = _swish(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", name="conv2",
                    dtype=self.dtype)(h)
        if in_ch != self.out_channels:
            if self.conv_shortcut:
                x = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                            name="conv_shortcut", dtype=self.dtype)(x)
            else:
                x = nn.Conv(self.out_channels, (1, 1), name="nin_shortcut",
                            dtype=self.dtype)(x)
        return x + h


class AttnBlockDDIM(nn.Module):
    """unet.py:137-181: full spatial self-attention via 1x1-conv q/k/v."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = _gn("norm", self.dtype)(x)
        q = nn.Conv(c, (1, 1), name="q", dtype=self.dtype)(h)
        k = nn.Conv(c, (1, 1), name="k", dtype=self.dtype)(h)
        v = nn.Conv(c, (1, 1), name="v", dtype=self.dtype)(h)
        b, hh, ww, _ = q.shape
        q = q.reshape(b, hh * ww, c)
        k = k.reshape(b, hh * ww, c)
        v = v.reshape(b, hh * ww, c)
        attn = jnp.einsum("bic,bjc->bij", q, k) * (float(c) ** -0.5)
        attn = jax.nn.softmax(attn, axis=2)
        out = jnp.einsum("bij,bjc->bic", attn, v).reshape(b, hh, ww, c)
        out = nn.Conv(c, (1, 1), name="proj_out", dtype=self.dtype)(out)
        return x + out


class _Downsample(nn.Module):
    """unet.py:59-76: pad right/bottom by 1, then 3x3 stride-2 VALID conv
    (torch's asymmetric-padding workaround), or 2x2 avg-pool."""

    with_conv: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2),
                           padding="VALID", name="conv", dtype=self.dtype)(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class _Upsample(nn.Module):
    """unet.py:43-56: nearest x2 (exact pixel replication) + 3x3 conv."""

    with_conv: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.with_conv:
            x = nn.Conv(x.shape[-1], (3, 3), padding="SAME", name="conv",
                        dtype=self.dtype)(x)
        return x


class DiffusionUNet(nn.Module):
    """unet.py:184-339 twin. ``in_channels`` is the RAW feature width; the
    network input is its double (cat[cond, noisy], unet.py:197)."""

    ch: int
    out_ch: int
    ch_mult: tuple
    num_res_blocks: int
    attn_resolutions: tuple
    dropout: float = 0.0
    resamp_with_conv: bool = True
    resolution: int = 128  # hardcoded upstream (unet.py:198)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        ch, ch_mult = self.ch, tuple(self.ch_mult)
        num_resolutions = len(ch_mult)
        in_ch_mult = (1,) + ch_mult

        temb = get_timestep_embedding(t, ch)
        temb = nn.Dense(ch * 4, name="temb_dense_0", dtype=self.dtype)(temb)
        temb = _swish(temb)
        temb = nn.Dense(ch * 4, name="temb_dense_1", dtype=self.dtype)(temb)

        hs = [nn.Conv(ch, (3, 3), padding="SAME", name="conv_in",
                      dtype=self.dtype)(x)]
        curr_res = self.resolution
        for i_level in range(num_resolutions):
            block_out = ch * ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = ResnetBlockDDIM(
                    block_out, dropout=self.dropout, dtype=self.dtype,
                    name=f"down_{i_level}_block_{i_block}",
                )(hs[-1], temb, train)
                if curr_res in self.attn_resolutions:
                    h = AttnBlockDDIM(
                        dtype=self.dtype,
                        name=f"down_{i_level}_attn_{i_block}",
                    )(h)
                hs.append(h)
            if i_level != num_resolutions - 1:
                hs.append(_Downsample(
                    self.resamp_with_conv, dtype=self.dtype,
                    name=f"down_{i_level}_downsample",
                )(hs[-1]))
                curr_res = curr_res // 2

        h = hs[-1]
        h = ResnetBlockDDIM(h.shape[-1], dropout=self.dropout,
                            dtype=self.dtype, name="mid_block_1")(h, temb,
                                                                  train)
        h = ResnetBlockDDIM(h.shape[-1], dropout=self.dropout,
                            dtype=self.dtype, name="mid_block_2")(h, temb,
                                                                  train)

        for i_level in reversed(range(num_resolutions)):
            block_out = ch * ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlockDDIM(
                    block_out, dropout=self.dropout, dtype=self.dtype,
                    name=f"up_{i_level}_block_{i_block}",
                )(jnp.concatenate([h, hs.pop()], axis=-1), temb, train)
                if curr_res in self.attn_resolutions:
                    h = AttnBlockDDIM(
                        dtype=self.dtype, name=f"up_{i_level}_attn_{i_block}",
                    )(h)
            if i_level != 0:
                h = _Upsample(self.resamp_with_conv, dtype=self.dtype,
                              name=f"up_{i_level}_upsample")(h)
                curr_res = curr_res * 2

        h = _gn("norm_out", self.dtype)(h)
        h = _swish(h)
        return nn.Conv(self.out_ch, (3, 3), padding="SAME", name="conv_out",
                       dtype=self.dtype)(h)


def mdd_beta_schedule(num_timesteps: int):
    """Cond_Diff_Denoise's schedule buffers (radar_cond_diff_denoise.py
    :262-322): linear-sqrt betas with HARDCODED 5e-3..5e-2 endpoints,
    computed in float64 and registered as float32 — reproduced exactly."""
    betas = np.linspace(
        math.sqrt(5e-3), math.sqrt(5e-2), num_timesteps, dtype=np.float64
    ) ** 2
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    posterior_variance = (
        betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    )
    return {
        "sqrt_alphas_cumprod": np.sqrt(alphas_cumprod).astype(np.float32),
        "sqrt_one_minus_alphas_cumprod": np.sqrt(
            1.0 - alphas_cumprod
        ).astype(np.float32),
        "posterior_mean_coef1": (
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ).astype(np.float32),
        "posterior_mean_coef2": (
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas)
            / (1.0 - alphas_cumprod)
        ).astype(np.float32),
        "posterior_log_variance_clipped": np.log(
            np.maximum(posterior_variance, 1e-20)
        ).astype(np.float32),
    }


class CondDiffDenoise(nn.Module):
    """Cond_Diff_Denoise twin (radar_cond_diff_denoise.py:248-498).

    ``__call__(lidar_bev, radar_bev)`` runs the full reverse chain and
    returns the denoised x0 prediction. ``noises`` (optional) supplies the
    T gaussian draws explicitly — [0] for the initial q_sample
    (:466-468/:485-489), [1..T-1] for the posterior-sampling steps
    (:410-418) — for deterministic parity testing; otherwise they come from
    the module's "diffusion" rng stream when present, else a fixed key
    (deterministic inference; upstream inference is RNG-noisy by design).
    """

    model_cfg: Any  # mdd_block.model section
    num_timesteps: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lidar_bev, radar_bev, train: bool = False,
                 noises=None):
        m = self.model_cfg
        unet = DiffusionUNet(
            ch=int(m["ch"]),
            out_ch=int(m["out_ch"]),
            ch_mult=tuple(m["ch_mult"]),
            num_res_blocks=int(m["num_res_blocks"]),
            attn_resolutions=tuple(m["attn_resolutions"]),
            dropout=float(m.get("dropout", 0.0)),
            resamp_with_conv=bool(m.get("resamp_with_conv", True)),
            dtype=self.dtype,
            name="denoiser",
        )
        T = self.num_timesteps
        sched = mdd_beta_schedule(T)
        b = lidar_bev.shape[0]

        if noises is None:
            if self.has_rng("diffusion"):
                key = self.make_rng("diffusion")
            else:
                key = jax.random.PRNGKey(0)
            noises = jax.random.normal(
                key, (T,) + lidar_bev.shape, lidar_bev.dtype
            )

        # q_sample to t = T-1 (:466-468)
        t_last = T - 1
        x = (
            sched["sqrt_alphas_cumprod"][t_last] * lidar_bev
            + sched["sqrt_one_minus_alphas_cumprod"][t_last] * noises[0]
        )
        # reverse chain; the t-loop is static (T is a config constant)
        for step, t in enumerate(range(T - 1, -1, -1)):
            tt = jnp.full((b,), t, jnp.float32)
            x0 = unet(
                jnp.concatenate([radar_bev, x], axis=-1), tt, train
            )  # gen_pred :424-426; x0 parameterisation, no clamp
            if t == 0:
                return x0  # upsam=True final step (:390-392)
            mean = (
                sched["posterior_mean_coef1"][t] * x0
                + sched["posterior_mean_coef2"][t] * x
            )
            sigma = math.exp(0.5 * sched["posterior_log_variance_clipped"][t])
            x = mean + sigma * noises[step + 1]
        return x  # unreachable for T >= 1
