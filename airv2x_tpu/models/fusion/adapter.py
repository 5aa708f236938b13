"""STAMP feature-space adapters / reverters (twin of fuse_modules/adapter.py).

Each heterogeneous agent type translates its BEV feature map into a shared
"protocol" feature space (Adapter) and back (Reverter). The base class
handles the geometric alignment between the agent's native grid and the
protocol grid: bilinear resize by the resolution ratio plus center crop/pad
to the protocol extent (BaseAdapter :41-99). Variants: identity, 1x1 conv,
pixel-wise FC, and a ConvNeXt-block stack.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _geometry(args: dict):
    """Compute resize ratio + crop/pad (left, right, top, bottom), following
    BaseAdapter (:60-93)."""
    in_r = args["in_cav_lidar_range"]
    out_r = args["out_cav_lidar_range"]
    in_shape = args["in_feature_shape"]  # (H, W)
    out_shape = args["out_feature_shape"]

    in_range = np.array([in_r[3] - in_r[0], in_r[4] - in_r[1]])  # (x, y)
    out_range = np.array([out_r[3] - out_r[0], out_r[4] - out_r[1]])
    in_ratio = np.array([in_shape[1], in_shape[0]]) / in_range  # px per m
    out_ratio = np.array([out_shape[1], out_shape[0]]) / out_range
    feat_ratio = out_ratio / in_ratio  # (x, y) resize factors

    left_new = in_r[0] * in_ratio[0] * feat_ratio[0]
    right_new = in_r[3] * in_ratio[0] * feat_ratio[0]
    top_new = in_r[1] * in_ratio[1] * feat_ratio[1]
    bottom_new = in_r[4] * in_ratio[1] * feat_ratio[1]
    left_t = out_r[0] * out_ratio[0]
    right_t = out_r[3] * out_ratio[0]
    top_t = out_r[1] * out_ratio[1]
    bottom_t = out_r[4] * out_ratio[1]
    pads = (
        round(left_new - left_t),
        round(right_t - right_new),
        round(top_new - top_t),
        round(bottom_t - bottom_new),
    )  # (left, right, top, bottom); negative -> crop
    return feat_ratio, pads


def _resize_by(x, feat_ratio):
    h = int(round(x.shape[-3] * feat_ratio[1]))
    w = int(round(x.shape[-2] * feat_ratio[0]))
    return jax.image.resize(x, x.shape[:-3] + (h, w, x.shape[-1]), "bilinear")


def _crop_pad(x, pads):
    left, right, top, bottom = pads

    def axis(t, a, lo, hi):
        if lo > 0 or hi > 0:
            cfg = [(0, 0)] * t.ndim
            cfg[a] = (max(lo, 0), max(hi, 0))
            t = jnp.pad(t, cfg)
        if lo < 0:
            t = jax.lax.slice_in_dim(t, -lo, t.shape[a], axis=a)
        if hi < 0:
            t = jax.lax.slice_in_dim(t, 0, t.shape[a] + hi, axis=a)
        return t

    x = axis(x, x.ndim - 2, left, right)  # width
    x = axis(x, x.ndim - 3, top, bottom)  # height
    return x


class AdapterIdentity(nn.Module):
    args: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat_ratio, pads = _geometry(self.args)
        x = _resize_by(x, feat_ratio)
        if self.args["in_channels"] != self.args["out_channels"]:
            # channel-count change via linear interpolation along channels
            x = jax.image.resize(
                x, x.shape[:-1] + (self.args["out_channels"],), "linear"
            )
        return _crop_pad(x, pads)


class AdapterConv(nn.Module):
    args: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat_ratio, pads = _geometry(self.args)
        x = _resize_by(x, feat_ratio)
        x = nn.Conv(self.args["out_channels"], (1, 1), dtype=self.dtype)(x)
        return _crop_pad(x, pads)


class AdapterFC(nn.Module):
    """Pixel-wise fully-connected translation (AdapterFC :247-299)."""

    args: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat_ratio, pads = _geometry(self.args)
        x = _resize_by(x, feat_ratio)
        h, w = x.shape[-3], x.shape[-2]
        weights = self.param(
            "weights",
            nn.initializers.kaiming_uniform(),
            (h, w, self.args["in_channels"], self.args["out_channels"]),
        )
        biases = self.param(
            "biases", nn.initializers.zeros, (h, w, self.args["out_channels"])
        )
        y = jnp.einsum("...hwc,hwco->...hwo", x, weights.astype(x.dtype))
        y = y + biases.astype(x.dtype)
        return _crop_pad(y, pads)


class _ConvNeXtBlock(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.dim, (7, 7), padding="SAME", feature_group_count=self.dim,
            dtype=self.dtype,
        )(x)
        y = nn.LayerNorm(dtype=self.dtype)(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype)(y)
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (self.dim,))
        return x + gamma.astype(x.dtype) * y


class AdapterConvNext(nn.Module):
    args: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        sub = self.args.get("submodule_args", {})
        feat_ratio, pads = _geometry(self.args)
        x = x * sub.get("early_scale", 1.0)
        late = bool(sub.get("late_upsample", False))
        if not late:
            x = _resize_by(x, feat_ratio)
        dim = int(sub.get("dim", 64))
        x = nn.Conv(dim, (1, 1), dtype=self.dtype)(x)
        # reference configs name the block count num_of_blocks
        # (airv2x_stamp_collab_lidar.yaml:242)
        for _ in range(int(sub.get("depth", sub.get("num_of_blocks", 2)))):
            x = _ConvNeXtBlock(dim, dtype=self.dtype)(x)
        x = nn.Conv(self.args["out_channels"], (1, 1), dtype=self.dtype)(x)
        if late:
            x = _resize_by(x, feat_ratio)
        # the reference constructs a smoothing conv and pad geometry but its
        # AdapterConvNext.forward applies NEITHER (adapter.py:134-144 —
        # unlike the FC/DSA variants); stay faithful
        del pads
        return x


def _bilinear_sample_points(value, locs):
    """value (B, H, W, C); locs (B, Q, P, 2) normalized [0, 1] (x, y) ->
    (B, Q, P, C) bilinear samples, zero outside the map."""
    b, h, w, c = value.shape
    x = locs[..., 0] * w - 0.5
    y = locs[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    flat = value.reshape(b, h * w, c)

    def gather(yy, xx):
        ok = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
        g = jnp.take_along_axis(
            flat, idx.reshape(b, -1, 1).astype(jnp.int32), axis=1
        ).reshape(idx.shape + (c,))
        return g * ok[..., None].astype(value.dtype)

    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def _dsa_offset_bias(num_heads, num_points):
    """Directional ring bias for the sampling offsets, matching the
    reference's DeformableSpatialAttentionLayer.init_weights (:346-361)."""
    thetas = np.arange(num_heads, dtype=np.float32) * (2 * np.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None], (1, num_points, 1))
    grid *= np.arange(1, num_points + 1, dtype=np.float32)[None, :, None]
    return grid.reshape(-1)


class DSALayer(nn.Module):
    """One deformable spatial attention layer (adapter.py :300-430): each
    query token predicts per-head sampling offsets around its reference grid
    point, bilinearly samples the projected value map there and mixes the
    samples with a softmax over points."""

    out_channels: int
    num_heads: int = 8
    num_points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, value_map, spatial_shape):
        b, q, _ = query.shape
        h, w = spatial_shape
        nh, npt = self.num_heads, self.num_points
        if self.out_channels % nh:
            raise ValueError(
                f"DSA out_channels={self.out_channels} must be divisible by "
                f"num_heads={nh}"
            )
        dh = self.out_channels // nh

        offsets = nn.Dense(
            nh * npt * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *a: jnp.asarray(
                _dsa_offset_bias(nh, npt), self.dtype
            ),
            dtype=self.dtype,
        )(query).reshape(b, q, nh, npt, 2)
        weights = nn.Dense(
            nh * npt, kernel_init=nn.initializers.zeros, dtype=self.dtype
        )(query).reshape(b, q, nh, npt)
        weights = jax.nn.softmax(weights, axis=-1)

        value = nn.Dense(self.out_channels, dtype=self.dtype)(value_map)
        value = value.reshape(b, h, w, nh, dh)

        ys, xs = jnp.meshgrid(
            (jnp.arange(h) + 0.5) / h, (jnp.arange(w) + 0.5) / w, indexing="ij"
        )
        ref = jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1)  # (Q, 2)
        norm = jnp.asarray([w, h], self.dtype)
        locs = ref[None, :, None, None, :] + offsets / norm  # (B,Q,nh,npt,2)

        sampled = []
        for head in range(nh):
            s = _bilinear_sample_points(value[..., head, :], locs[:, :, head])
            sampled.append(jnp.sum(s * weights[:, :, head, :, None], axis=2))
        out = jnp.concatenate(sampled, axis=-1)  # (B, Q, out_c)
        return nn.Dense(self.out_channels, dtype=self.dtype)(out) + query


class AdapterDSA(nn.Module):
    """Deformable-spatial-attention adapter (adapter.py AdapterDSA :447-578):
    a 1x1-conv query map at the protocol resolution refined by a stack of
    RoPE'd deformable attention layers over the source feature map."""

    args: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = self.args
        sub = a.get("submodule_args", {})
        n_layers = int(sub.get("n_layers", 2))
        num_heads = int(sub.get("num_heads", 8))
        num_points = int(sub.get("num_points", 4))
        theta = float(sub.get("rope_theta", 10.0))
        out_c = int(a["out_channels"])
        dh = out_c // num_heads

        feat_ratio, pads = _geometry(a)
        src_h, src_w = x.shape[-3], x.shape[-2]
        query_map = nn.Conv(out_c, (1, 1), dtype=self.dtype)(
            _resize_by(x, feat_ratio)
        )
        b, qh, qw, _ = query_map.shape
        q = query_map.reshape(b, qh * qw, out_c)
        key = x.reshape(b, src_h * src_w, x.shape[-1])

        # mixed-RoPE (learnable 2D frequencies per layer/head, rope-mixed
        # branch of AdapterDSA :491-506)
        ys, xs = jnp.meshgrid(
            jnp.arange(qh, dtype=jnp.float32),
            jnp.arange(qw, dtype=jnp.float32),
            indexing="ij",
        )
        t_y, t_x = ys.reshape(-1), xs.reshape(-1)

        def freq_init(rng, shape, dtype=jnp.float32):
            # per (layer, head, dh//2): magnitude theta^-k with random 2D dir
            mags = theta ** (
                -jnp.arange(dh // 2, dtype=jnp.float32) / max(dh // 2, 1)
            )
            ang = jax.random.uniform(
                rng, (shape[1], num_heads, dh // 2), maxval=2 * jnp.pi
            )
            fx = mags * jnp.cos(ang)
            fy = mags * jnp.sin(ang)
            return jnp.stack([fx, fy]).reshape(shape).astype(dtype)

        freqs = self.param(
            "rope_freqs", freq_init, (2, n_layers, num_heads * (dh // 2))
        )

        for i in range(n_layers):
            f = freqs[:, i].reshape(2, num_heads, dh // 2)
            angle = (
                f[0][None] * t_x[:, None, None] + f[1][None] * t_y[:, None, None]
            )  # (Q, nh, dh//2)
            cos = jnp.cos(angle).reshape(1, qh * qw, out_c // 2)
            sin = jnp.sin(angle).reshape(1, qh * qw, out_c // 2)
            qr = q.reshape(b, qh * qw, out_c // 2, 2)
            q = jnp.stack(
                [
                    qr[..., 0] * cos - qr[..., 1] * sin,
                    qr[..., 0] * sin + qr[..., 1] * cos,
                ],
                -1,
            ).reshape(b, qh * qw, out_c).astype(self.dtype)
            q = DSALayer(
                out_channels=out_c,
                num_heads=num_heads,
                num_points=num_points,
                dtype=self.dtype,
                name=f"dsa_layer_{i}",
            )(q, key, (src_h, src_w))

        out = q.reshape(b, qh, qw, out_c)
        return _crop_pad(out, pads)


_VARIANTS = {
    "identity": AdapterIdentity,
    "adapterconv": AdapterConv,
    "adapterfc": AdapterFC,
    "adapterconvnext": AdapterConvNext,
    "adapterdsa": AdapterDSA,
}


class Adapter(nn.Module):
    """Dispatch wrapper (adapter.py Adapter :759-781); Reverter is the same
    module with swapped in/out config."""

    cfg: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        name = self.cfg["core_method"]
        if name not in _VARIANTS:
            raise NotImplementedError(f"adapter '{name}'")
        return _VARIANTS[name](args=self.cfg["args"], dtype=self.dtype)(x, train)
