"""How2comm collaboration machinery (flax twins of the reference's
how2comm_modules/{feature_flow, mutual_communication, communication,
how2comm_preprocess}.py).

Static-slot design: everything operates on dense (B, L, H, W, C) agent-slot
tensors with ``agent_mask`` — the reference itself pads to ``max_cav`` = 5
before its STCFormer stage, so the slot shapes match exactly; the ragged
per-sample python loops become masked vectorized ops.

Components:
  * ``FlowGenerator`` (feature_flow.py:346-421) — per collaborator, the
    concatenated [history, current] feature pair runs through a ResNet BEV
    backbone (feature_flow.py:135-235, inplanes 128, extra //6 deblock) and
    ``ReduceInfTC`` (DFF mode, :238-311) to predict a 2-channel flow offset
    + scale; the delayed feature is flow-warped (grid_sample, border
    padding) to estimate the current one. Offset loss = MSE(cosine(target,
    estimate), 1).
  * ``MutualCommunication`` (mutual_communication.py:92-269) — ego channel/
    spatial *requests* (1 - self attention) fused with each collaborator's
    attentions, gaussian-smoothed (2d spatial + 1d channel), scaled by the
    collaborator's activation map, thresholded into a per-channel-per-pixel
    sparse transmission mask. The DeepInfoMax mutual-information loss
    (:46-90) regularizes sparse vs dense features.
  * ``confidence_maps`` (communication.py:43-83) — gaussian-smoothed
    max-sigmoid detection confidences (the mask/rate outputs of the
    reference are discarded by How2comm's forward, so only the maps are
    produced).

Masked-mean deviations (documented): losses average over *present*
neighbor slots instead of the reference's ragged per-sample tensors, and
the DeepInfoMax "marginal" pairing rolls the static slot axis.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from airv2x_tpu.models.camera.trunks import TorchBasicBlock
from airv2x_tpu.models.fusion.msda import sample_bilinear_zeros


def gaussian_kernel_2d(k_size: int, sigma: float) -> np.ndarray:
    """mutual_communication.init_gaussian_filter (:122-135) — NOTE the
    reference's normalization quirk: 1 / (2*pi*sigma), not sigma^2, and no
    re-normalization to sum 1."""
    center = k_size // 2
    x, y = np.mgrid[0 - center : k_size - center, 0 - center : k_size - center]
    return (
        1.0 / (2 * np.pi * sigma) * np.exp(-(x**2 + y**2) / (2 * sigma**2))
    ).astype(np.float32)


def gaussian_kernel_1d(k_size: int, sigma: float) -> np.ndarray:
    """The d1_gaussian_filter (:115-121) — this one IS normalized."""
    x = np.arange(-(k_size - 1) // 2, (k_size + 1) // 2, dtype=np.float32)
    g = np.exp(-(x**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def gaussian_smooth_2d(x, kernel: np.ndarray):
    """Depthwise 'same' conv of (..., H, W, 1) with a fixed 2d kernel."""
    k = kernel.shape[0]
    w = jnp.asarray(kernel, x.dtype).reshape(k, k, 1, 1)
    lead = x.shape[:-3]
    flat = x.reshape((-1,) + x.shape[-3:])
    out = jax.lax.conv_general_dilated(
        flat, w, (1, 1), [((k - 1) // 2, (k - 1) // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out.reshape(lead + out.shape[1:])


def gaussian_smooth_channels(v, kernel: np.ndarray):
    """1d gaussian over the channel axis of (..., C) (the reference's
    F.conv1d over a (1, 1, C) view, :199-204)."""
    k = kernel.shape[0]
    c = v.shape[-1]
    w = jnp.asarray(kernel, v.dtype).reshape(k, 1, 1)
    flat = v.reshape(-1, c, 1)
    out = jax.lax.conv_general_dilated(
        flat, w, (1,), [((k - 1) // 2, (k - 1) // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out.reshape(v.shape)


def flow_warp_border(feats, flow):
    """feature_flow.flow_warp_feats (:372-378): warp (..., H, W, C) by a
    per-pixel (..., H, W, 2) (x, y) offset field; grid_sample bilinear,
    padding_mode='border', align_corners=False."""
    h, w = feats.shape[-3], feats.shape[-2]
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    gx = (flow[..., 0] + xs) / ((w - 1) / 2.0) - 1.0
    gy = (flow[..., 1] + ys) / ((h - 1) / 2.0) - 1.0
    # normalized -> pixel (align_corners=False), clamped (border padding)
    px = jnp.clip(((gx + 1.0) * w - 1.0) * 0.5, 0.0, w - 1)
    py = jnp.clip(((gy + 1.0) * h - 1.0) * 0.5, 0.0, h - 1)

    lead = feats.shape[:-3]
    f = feats.reshape((-1,) + feats.shape[-3:])
    out = jax.vmap(sample_bilinear_zeros)(
        f, px.reshape((-1, h, w)), py.reshape((-1, h, w))
    )
    return out.reshape(lead + (h, w, feats.shape[-1]))


def _bn(train, dtype, name, eps=1e-5, momentum=0.9):
    return nn.BatchNorm(
        use_running_average=not train, momentum=momentum, epsilon=eps,
        dtype=dtype, name=name,
    )


class TorchConvTranspose(nn.Module):
    """torch ConvTranspose2d(k, s, p, output_padding) twin: conv over the
    stride-dilated input with padding (k-1-p, k-1-p+op). The converter's
    ``deconv_kernel`` (flip + transpose) makes torch weights drop in."""

    features: int
    kernel: int
    stride: int
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_c = x.shape[-1]
        k = self.kernel
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, in_c, self.features),
        ).astype(self.dtype)
        pad = k - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w, (1, 1),
            [(pad, pad + self.output_padding)] * 2,
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + self.param(
                "bias", nn.initializers.zeros, (self.features,)
            ).astype(self.dtype)
        return y


class ReduceInfTC(nn.Module):
    """feature_flow.ReduceInfTC (:238-311), DFF mode: conv pyramid down to
    channel//64 and back, then flow offset (2ch) + scale (1ch) heads."""

    channel: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channel
        y = nn.Conv(c // 4, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, name="conv1_2")(x)
        y = nn.relu(_bn(train, self.dtype, "bn1_2")(y))
        y = nn.Conv(c // 8, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, name="conv1_3")(y)
        y = nn.relu(_bn(train, self.dtype, "bn1_3")(y))
        y = nn.Conv(max(1, c // 64), (3, 3), strides=(2, 2),
                    padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="conv1_4")(y)
        y = nn.relu(_bn(train, self.dtype, "bn1_4")(y))

        y = TorchConvTranspose(c // 8, 3, 2, padding=1, dtype=self.dtype,
                               name="deconv2_1")(y)
        y = nn.relu(_bn(train, self.dtype, "bn2_1")(y))
        y = TorchConvTranspose(c // 4, 3, 2, padding=0, dtype=self.dtype,
                               name="deconv2_2")(y)
        y = nn.relu(_bn(train, self.dtype, "bn2_2")(y))
        y = TorchConvTranspose(c // 2, 3, 2, padding=0, output_padding=1,
                               dtype=self.dtype, name="deconv2_3")(y)
        y = nn.relu(_bn(train, self.dtype, "bn2_3")(y))

        offset = nn.Conv(2, (3, 3), padding=[(1, 1), (1, 1)],
                         dtype=self.dtype, name="conv_flow")(y)
        scale = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv_scale")(y)
        return offset, scale + 1.0


class FlowBackbone(nn.Module):
    """feature_flow.ResNetBEVBackbone (:135-235): torchvision-style
    BasicBlock stages (inplanes 128) + per-level deconv deblocks + the
    extra ``c_in -> c_in // 6`` 2x deblock."""

    layer_nums: Sequence[int]
    layer_strides: Sequence[int]
    num_filters: Sequence[int]
    upsample_strides: Sequence[int]
    num_upsample_filters: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = []
        in_c = x.shape[-1]
        for li, (n, s, f) in enumerate(
            zip(self.layer_nums, self.layer_strides, self.num_filters)
        ):
            for bi in range(n):
                stride = s if bi == 0 else 1
                ds = bi == 0 and (stride != 1 or in_c != f)
                x = TorchBasicBlock(
                    f, stride=stride, downsample=ds, dtype=self.dtype,
                    name=f"layer{li}_{bi}",
                )(x, train)
                in_c = f
            feats.append(x)

        ups = []
        for i, (f, s) in enumerate(
            zip(self.num_upsample_filters, self.upsample_strides)
        ):
            y = TorchConvTranspose(f, s, s, use_bias=False, dtype=self.dtype,
                                   name=f"deblock{i}_deconv")(feats[i])
            y = _bn(train, self.dtype, f"deblock{i}_bn", eps=1e-3,
                    momentum=0.99)(y)
            ups.append(nn.relu(y))
        x = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        c_in = sum(self.num_upsample_filters)
        y = TorchConvTranspose(c_in // 6, 2, 2, use_bias=False,
                               dtype=self.dtype, name="final_deconv")(x)
        y = _bn(train, self.dtype, "final_bn", eps=1e-3, momentum=0.99)(y)
        return nn.relu(y)


class FlowGenerator(nn.Module):
    """feature_flow.FlowGenerator (:346-421), static slots."""

    backbone_cfg: dict
    channel: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cur, hist, agent_mask, train: bool = False):
        """cur/hist (B, L, H, W, C) slot features (ego first);
        agent_mask (B, L). Returns (estimated-current features (B, L, H, W,
        C) with ego slot = true current, offset MSE loss)."""
        b, l, h, w, c = cur.shape
        bb = self.backbone_cfg
        backbone = FlowBackbone(
            layer_nums=bb["layer_nums"],
            layer_strides=bb["layer_strides"],
            num_filters=bb["num_filters"],
            upsample_strides=bb["upsample_strides"],
            num_upsample_filters=bb["num_upsample_filter"],
            dtype=self.dtype,
            name="backbone",
        )
        pre_encoder = ReduceInfTC(2 * self.channel, dtype=self.dtype,
                                  name="pre_encoder")

        # time_list.reverse() puts history first in the channel concat
        colla = jnp.concatenate([hist[:, 1:], cur[:, 1:]], axis=-1)
        flat = colla.reshape((b * (l - 1), h, w, 2 * c))
        fused = backbone(flat, train)
        offset, scale = pre_encoder(fused, train)

        src = hist[:, 1:].reshape((b * (l - 1), h, w, c))
        tgt = cur[:, 1:].reshape((b * (l - 1), h, w, c))
        est = flow_warp_border(src, offset) * scale
        # cosine(target, estimate) per collaborator -> MSE against 1
        dot = jnp.sum(est * tgt, axis=(1, 2, 3))
        nrm = jnp.linalg.norm(est.reshape(b * (l - 1), -1), axis=1) * (
            jnp.linalg.norm(tgt.reshape(b * (l - 1), -1), axis=1)
        )
        sim = dot / jnp.maximum(nrm, 1e-8)
        nmask = agent_mask[:, 1:].reshape(-1).astype(sim.dtype)
        per_sample = ((sim - 1.0) ** 2 * nmask).reshape(b, l - 1)
        cnt = jnp.maximum(agent_mask[:, 1:].sum(axis=1).astype(sim.dtype), 1.0)
        offset_loss = jnp.sum(per_sample.sum(axis=1) / cnt)

        est = est.reshape(b, l - 1, h, w, c)
        est = est * agent_mask[:, 1:, None, None, None].astype(est.dtype)
        return jnp.concatenate([cur[:, :1], est], axis=1), offset_loss


class MutualCommunication(nn.Module):
    """mutual_communication.Communication (:92-269), static slots."""

    in_planes: int
    thre: float
    request_flag: bool = True
    k_size: int = 5
    c_sigma: float = 1.0
    ratio: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, agent_mask, train: bool = False):
        """feats (B, L, H, W, C) ego-frame slot features -> (sparse feats,
        DeepInfoMax loss, mean comm rate, sparse masks (B, L, H, W, C))."""
        b, l, h, w, c = feats.shape
        g2 = gaussian_kernel_2d(self.k_size, self.c_sigma)
        g1 = gaussian_kernel_1d(self.k_size, self.c_sigma)

        # Channel_Request_Attention (:9-26): shared MLP over avg+max pools
        mlp0 = nn.Conv(self.in_planes // self.ratio, (1, 1), use_bias=False,
                       dtype=self.dtype, name="ch_mlp_0")
        mlp1 = nn.Conv(self.in_planes, (1, 1), use_bias=False,
                       dtype=self.dtype, name="ch_mlp_1")

        def shared_mlp(v):
            return mlp1(nn.relu(mlp0(v)))

        flat = feats.reshape(b * l, h, w, c)
        avg = flat.mean(axis=(1, 2), keepdims=True)
        mx = flat.max(axis=(1, 2), keepdims=True)
        ch_att = jax.nn.sigmoid(shared_mlp(avg) + shared_mlp(mx))  # (BL,1,1,C)
        ch_att = ch_att.reshape(b, l, 1, 1, c)

        # Spatial_Request_Attention (:29-43)
        sp_in = jnp.concatenate(
            [flat.mean(axis=-1, keepdims=True), flat.max(axis=-1, keepdims=True)],
            axis=-1,
        )
        sp_att = jax.nn.sigmoid(
            nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="spatial_request")(sp_in)
        ).reshape(b, l, h, w, 1)

        activation = gaussian_smooth_2d(
            jax.nn.sigmoid(feats.mean(axis=-1, keepdims=True)), g2
        )

        ego_ch_req = 1.0 - ch_att[:, :1]
        ego_sp_req = 1.0 - sp_att[:, :1]

        if self.request_flag:
            ch_in = jnp.concatenate(
                [jnp.broadcast_to(ego_ch_req, ch_att[:, 1:].shape),
                 ch_att[:, 1:]], axis=-1,
            )
            ch_coeff = nn.Conv(self.in_planes, (1, 1), use_bias=False,
                               dtype=self.dtype, name="channel_fusion")(
                ch_in.reshape(b * (l - 1), 1, 1, 2 * c)
            ).reshape(b, l - 1, 1, 1, c)
            sp_in2 = jnp.concatenate(
                [jnp.broadcast_to(ego_sp_req, sp_att[:, 1:].shape),
                 sp_att[:, 1:]], axis=-1,
            )
            sp_coeff = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                               name="spatial_fusion")(
                sp_in2.reshape(b * (l - 1), h, w, 2)
            ).reshape(b, l - 1, h, w, 1)
        else:
            ch_coeff = ch_att[:, 1:]
            sp_coeff = sp_att[:, 1:]

        ch_coeff = jax.nn.sigmoid(ch_coeff)
        sp_coeff = jax.nn.sigmoid(sp_coeff)
        ch_coeff = gaussian_smooth_channels(ch_coeff, g1)
        sp_coeff = gaussian_smooth_2d(sp_coeff, g2)

        sparse_matrix = ch_coeff * sp_coeff * activation[:, 1:]
        sparse_mask = (sparse_matrix > self.thre).astype(feats.dtype)

        nmask = agent_mask[:, 1:].astype(feats.dtype)  # (B, L-1)
        rates = sparse_mask.mean(axis=(2, 3, 4)) * nmask
        comm_rate = jnp.sum(rates) / jnp.maximum(jnp.sum(nmask), 1.0)

        sparse_neigh = feats[:, 1:] * sparse_mask
        sparse = jnp.concatenate([feats[:, :1], sparse_neigh], axis=1)
        masks = jnp.concatenate(
            [jnp.ones_like(feats[:, :1]), jnp.broadcast_to(
                sparse_mask, feats[:, 1:].shape)], axis=1,
        )

        # StatisticsNetwork + DeepInfoMaxLoss (:46-90); marginal pairing
        # rolls the slot axis (the reference rolls its ragged agent list)
        # StatisticsNetwork(2C): conv channels are twice its input (:48-66)
        sc1 = nn.Conv(4 * c, (1, 1), dtype=self.dtype, name="stat_conv1")
        sc2 = nn.Conv(4 * c, (1, 1), dtype=self.dtype, name="stat_conv2")
        sc3 = nn.Conv(1, (1, 1), dtype=self.dtype, name="stat_conv3")

        def stat_net(v):
            return sc3(nn.relu(sc2(nn.relu(sc1(v)))))

        org = feats.reshape(b * l, h, w, c)
        sp = sparse.reshape(b * l, h, w, c)
        prime = jnp.roll(feats, shift=-1, axis=1).reshape(b * l, h, w, c)
        t_joint = stat_net(jnp.concatenate([org, sp], axis=-1))
        t_prime = stat_net(jnp.concatenate([prime, sp], axis=-1))
        wmask = agent_mask.reshape(b * l, 1, 1, 1).astype(feats.dtype)
        denom = jnp.maximum(wmask.sum() * h * w, 1.0)
        joint = jnp.sum(-jax.nn.softplus(-t_joint) * wmask) / denom
        marginal = jnp.sum(jax.nn.softplus(t_prime) * wmask) / denom
        # only samples with >= 2 agents communicate
        multi = (agent_mask.sum(axis=1) > 1).any().astype(feats.dtype)
        commu_loss = -(joint - marginal) * multi

        return sparse, commu_loss, comm_rate, masks


def confidence_maps(psm, k_size: int = 5, c_sigma: float = 1.0):
    """communication.Communication.forward (:43-60): per-slot confidence =
    gaussian-smoothed max-over-anchors sigmoid of the single-agent psm.
    psm (B, L, H, W, A) -> (B, L, H, W, 1)."""
    conf = jnp.max(jax.nn.sigmoid(psm), axis=-1, keepdims=True)
    return gaussian_smooth_2d(conf, gaussian_kernel_2d(k_size, c_sigma))
