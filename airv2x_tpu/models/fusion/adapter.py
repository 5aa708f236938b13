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
        for _ in range(int(sub.get("depth", 2))):
            x = _ConvNeXtBlock(dim, dtype=self.dtype)(x)
        x = nn.Conv(self.args["out_channels"], (1, 1), dtype=self.dtype)(x)
        if late:
            x = _resize_by(x, feat_ratio)
        x = nn.Conv(
            self.args["out_channels"], (3, 3), padding="SAME", dtype=self.dtype
        )(x)
        return _crop_pad(x, pads)


_VARIANTS = {
    "identity": AdapterIdentity,
    "adapterconv": AdapterConv,
    "adapterfc": AdapterFC,
    "adapterconvnext": AdapterConvNext,
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
