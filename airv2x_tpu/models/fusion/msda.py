"""Multi-scale deformable attention (flax twin of the reference's CUDA
``MultiScaleDeformableAttention`` extension + its surrounding transformer,
how2comm_modules/how2comm_deformable_transformer.py).

The CUDA kernel (``MSDA.ms_deform_attn_forward``) bilinearly samples each
level's value map at ``n_points`` learned offsets per head around each
query's reference point and blends them with softmaxed attention weights —
equivalent (per the upstream Deformable-DETR pure-torch reference
``ms_deform_attn_core_pytorch``) to a grid_sample with align_corners=False
and zero padding at ``loc * size - 0.5``. Here it is a vectorized gather —
static shapes (fixed query count, levels, points), XLA-fusable.

In How2comm the "levels" are the ``max_cav`` agent slots of one BEV scale
(RPN_transformer_deformable_mtf_singlescale, :430-524).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def sample_bilinear_zeros(img, x, y):
    """Bilinear sample of (H, W, C) at float pixel coords x/y (any shape);
    zero padding outside (torch grid_sample padding_mode='zeros')."""
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0)[..., None]
    ty = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return v * inside[..., None].astype(img.dtype)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    return top * (1 - ty) + bot * ty


class MSDeformAttn(nn.Module):
    """how2comm_deformable_transformer.MSDeformAttn (:75-190).

    Query-conditioned sampling offsets + attention weights over
    (levels x points) per head; values projected per head and bilinearly
    sampled from each level map.
    """

    d_model: int
    d_head: int = 64
    n_levels: int = 5
    n_heads: int = 8
    n_points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, reference_points, src_maps):
        """query (B, Lq, d_model); reference_points (B, Lq, levels, 2) in
        [0, 1] (x, y); src_maps (B, levels, H, W, d_model).
        Returns (B, Lq, d_model)."""
        b, lq = query.shape[:2]
        lv, h, w = src_maps.shape[1:4]
        heads, pts, dh = self.n_heads, self.n_points, self.d_head

        value = nn.Dense(dh * heads, dtype=self.dtype, name="value_proj")(
            src_maps
        )  # (B, levels, H, W, heads*dh)
        value = value.reshape(b, lv, h, w, heads, dh)

        offsets = nn.Dense(
            heads * self.n_levels * pts * 2, dtype=self.dtype,
            name="sampling_offsets",
        )(query).reshape(b, lq, heads, self.n_levels, pts, 2)
        attn = nn.Dense(
            heads * self.n_levels * pts, dtype=self.dtype,
            name="attention_weights",
        )(query).reshape(b, lq, heads, self.n_levels * pts)
        attn = jax.nn.softmax(attn, axis=-1).reshape(
            b, lq, heads, self.n_levels, pts
        )

        # normalized sampling locations (x, y) in [0, 1] units
        normalizer = jnp.asarray([w, h], jnp.float32)
        loc = (
            reference_points[:, :, None, :, None, :]
            + offsets[:, :, :, :lv] / normalizer
        )  # (B, Lq, heads, lv, pts, 2)

        # pixel coords per the CUDA kernel / grid_sample(align_corners=False)
        px = loc[..., 0] * w - 0.5
        py = loc[..., 1] * h - 0.5

        # One flat gather per bilinear corner: index (level, y, x, head)
        # rows of the flattened value table — keeps the XLA graph to four
        # gathers instead of per-head/per-level nests (compile-time
        # critical on TPU).
        lv_idx = jnp.arange(lv)[None, None, :, None]
        head_idx = jnp.arange(heads)[None, :, None, None]

        def per_batch(val_b, px_b, py_b, attn_b):
            # val_b (lv, H, W, heads, dh); px/py (Lq, heads, lv, pts)
            val_flat = val_b.reshape(lv * h * w * heads, dh)
            x0 = jnp.floor(px_b)
            y0 = jnp.floor(py_b)
            tx = (px_b - x0)[..., None]
            ty = (py_b - y0)[..., None]
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)

            def tap(yi, xi):
                inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
                yc = jnp.clip(yi, 0, h - 1)
                xc = jnp.clip(xi, 0, w - 1)
                rows = ((lv_idx * h + yc) * w + xc) * heads + head_idx
                v = jnp.take(val_flat, rows.reshape(-1), axis=0)
                v = v.reshape(rows.shape + (dh,))
                return v * inside[..., None].astype(val_flat.dtype)

            v00 = tap(y0i, x0i)
            v01 = tap(y0i, x0i + 1)
            v10 = tap(y0i + 1, x0i)
            v11 = tap(y0i + 1, x0i + 1)
            top = v00 * (1 - tx) + v01 * tx
            bot = v10 * (1 - tx) + v11 * tx
            sampled = top * (1 - ty) + bot * ty  # (Lq, heads, lv, pts, dh)
            return jnp.sum(sampled * attn_b[..., None], axis=(2, 3))

        out = jax.vmap(per_batch)(value, px, py, attn)  # (B, Lq, heads, dh)
        out = out.reshape(b, lq, heads * dh)
        return nn.Dense(self.d_model, dtype=self.dtype, name="output_proj")(out)


class FeedForwardGELU(nn.Module):
    """transformer FeedForward (:286-299) with the tanh-approx GELU."""

    dim: int
    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=True)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class DeformTransformer(nn.Module):
    """Deform_Transformer (:344-429): depth x [shared-PreNorm deformable
    cross-attention + residual, PreNorm feed-forward + residual].

    The reference also *constructs* a self-attention block per layer but
    never calls it in forward (:398-424); it has no flax counterpart (the
    converter consumes its unused weights).
    """

    dim: int
    depth: int = 1
    heads: int = 8
    levels: int = 5
    dim_head: int = 64
    mlp_dim: int = 256
    n_points: int = 9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, src_maps, center_pos):
        """x (B, K, dim) queries; src_maps (B, levels, H, W, dim);
        center_pos (B, K, 2) normalized (x, y)."""
        pos_embed = nn.Dense(self.dim, dtype=self.dtype, name="pos_embedding")(
            center_pos
        )
        ref = jnp.repeat(center_pos[:, :, None, :], self.levels, axis=2)
        for i in range(self.depth):
            norm = nn.LayerNorm(dtype=self.dtype, name=f"layer{i}_ca_norm")
            src_n = norm(src_maps)
            x_att = MSDeformAttn(
                d_model=self.dim, d_head=self.dim_head,
                n_levels=self.levels, n_heads=self.heads,
                n_points=self.n_points, dtype=self.dtype,
                name=f"layer{i}_cross_attn",
            )(norm(x) + pos_embed, ref, src_n)
            x = x_att + x
            xn = nn.LayerNorm(dtype=self.dtype, name=f"layer{i}_ff_norm")(x)
            x = FeedForwardGELU(
                self.dim, self.mlp_dim, dtype=self.dtype, name=f"layer{i}_ff"
            )(xn) + x
        return x


class DeformableQueryRefine(nn.Module):
    """RPN_transformer_deformable_mtf_singlescale (:430-524): the top-K
    most confident ego BEV cells become queries; each deformably attends
    over every agent slot's map (slots = attention levels) and the refined
    features are scattered back into the ego map.

    TPU deviation (documented): the reference's dynamic query count
    ``max(#(conf > 1e-3), 500)`` becomes the static ``num_queries``.
    """

    channels: int
    n_points: int
    num_queries: int = 500
    max_cav: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, psm):
        """x (B, L, H, W, C) slot maps (ego first, zero-padded);
        psm (B, L, H, W, 1) confidence maps. Returns (B, H, W, C)."""
        b, l, h, w, c = x.shape
        k = min(self.num_queries, h * w)
        scores = jnp.sum(psm[..., 0], axis=1).reshape(b, h * w)  # (B, HW)
        _, order = jax.lax.top_k(scores, k)  # (B, K)

        ego = x[:, 0].reshape(b, h * w, c)
        ct_feat = jnp.take_along_axis(ego, order[..., None], axis=1)  # (B,K,C)

        y_coor = (order // w).astype(jnp.float32) / h
        x_coor = (order % w).astype(jnp.float32) / w
        center_pos = jnp.stack([x_coor, y_coor], axis=-1)  # (B, K, 2)

        refined = DeformTransformer(
            dim=self.channels, depth=1, heads=8, levels=self.max_cav,
            dim_head=64, mlp_dim=256, n_points=self.n_points,
            dtype=self.dtype, name="transformer",
        )(ct_feat, x, center_pos)

        out = jax.vmap(lambda e, o, r: e.at[o].set(r))(ego, order, refined)
        return out.reshape(b, h, w, c)
