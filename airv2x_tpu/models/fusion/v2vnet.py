"""V2VNet fusion: iterative GNN message passing over warped BEV features.

Behavioural twin of v2vnet_modules/v2v_fuse.py:18-204 + convgru.py, dense
formulation: instead of per-sample python loops over ragged agent groups,
each round warps every agent's features into every receiver's frame (lax.map
over receivers to bound memory), computes messages with a shared CNN, masks
by warp ROI + agent mask, aggregates, and updates node states with a ConvGRU.
The ego node (slot 0) provides the output.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from airv2x_tpu.ops.warp import normalized_pairwise_affine, warp_affine_normalized


class ConvGRUCell(nn.Module):
    """Convolutional GRU cell (convgru.py twin)."""

    hidden_dim: int
    kernel_size: tuple
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, h):
        k = self.kernel_size
        combined = jnp.concatenate([x, h], axis=-1)
        gates = nn.Conv(2 * self.hidden_dim, k, padding="SAME", dtype=self.dtype)(
            combined
        )
        reset, update = jnp.split(jax.nn.sigmoid(gates), 2, axis=-1)
        cand_in = jnp.concatenate([x, reset * h], axis=-1)
        cand = jnp.tanh(
            nn.Conv(self.hidden_dim, k, padding="SAME", dtype=self.dtype)(cand_in)
        )
        return (1.0 - update) * h + update * cand


class V2VNetFusion(nn.Module):
    args: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, agent_mask, pairwise_t_full, train: bool = False):
        """x: (B, L, H, W, C); pairwise_t_full: (B, L, L, 4, 4) with
        [i, j] = T from agent j into agent i's frame. Returns (B, H, W, C)."""
        a = self.args
        b, l, h, w, c = x.shape
        num_iter = int(a["num_iteration"])
        agg = a.get("agg_operator", "avg")
        gru_flag = bool(a.get("gru_flag", True))

        aff = normalized_pairwise_affine(
            pairwise_t_full, h, w, a["voxel_size"][0], a["downsample_rate"]
        )  # (B, L, L, 2, 3)

        ones = jnp.ones((b, l, h, w, 1), jnp.float32)
        msg_cnn = nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype)
        # reference configs use a per-layer list: kernel_size: [[3, 3]]
        ks = a["conv_gru"]["kernel_size"]
        if isinstance(ks[0], (list, tuple)):
            ks = ks[0]
        gru = ConvGRUCell(
            hidden_dim=c,
            kernel_size=tuple(ks),
            dtype=self.dtype,
        )
        am = agent_mask[:, :, None, None, None].astype(x.dtype)  # (B, L, 1,1,1)

        feats = x
        for _ in range(num_iter):
            def receiver(i):
                # warp every sender j into receiver i's frame
                warped = warp_affine_normalized(feats, aff[:, i])  # (B, L, H, W, C)
                roi = warp_affine_normalized(ones, aff[:, i]) > 0.5
                ego_rep = jnp.broadcast_to(feats[:, i : i + 1], warped.shape)
                msg_in = jnp.concatenate([warped, ego_rep], axis=-1)
                msg = msg_cnn(msg_in) * roi.astype(x.dtype) * am
                if agg == "max":
                    agg_feat = jnp.max(
                        jnp.where(am > 0, msg, -1e9), axis=1
                    )
                    agg_feat = jnp.where(agg_feat <= -1e8, 0.0, agg_feat)
                else:  # avg over valid agents
                    agg_feat = jnp.sum(msg, axis=1) / jnp.maximum(
                        jnp.sum(am, axis=1), 1.0
                    )
                if gru_flag:
                    # the reference runs the ConvGRU on a length-1 sequence
                    # from a ZERO hidden state, with the concatenated
                    # [ego, aggregated message] as the input
                    # (v2v_fuse.py:168-177, convgru.py init_hidden)
                    gru_in = jnp.concatenate([feats[:, i], agg_feat], axis=-1)
                    return gru(gru_in, jnp.zeros_like(feats[:, i]))
                return feats[:, i] + agg_feat

            updated = [receiver(i) for i in range(l)]
            feats = jnp.stack(updated, axis=1)

        out = feats[:, 0]  # ego
        out = nn.Dense(c, dtype=self.dtype)(out)
        return out
