"""Hand-instantiated torch twins of the reference camera-branch trunks.

The reference builds its LSS camera encoders from ``efficientnet_pytorch``
and ``torchvision`` (opencood/models/sub_modules/lss_submodule.py:50-349),
neither of which is installed in this image. These twins replicate the
documented block structure of those libraries — module attribute names
match the originals exactly so their ``state_dict()`` keys are identical
to what a real reference checkpoint contains, which is what
``airv2x_tpu.utils.torch_convert.convert_cam_encoder`` consumes.

Sources of truth for the structures:
  * EfficientNet-b0: lukemelas/EfficientNet-PyTorch ``model.py``
    (MBConvBlock: _expand_conv/_bn0/_depthwise_conv/_bn1/_se_reduce/
    _se_expand/_project_conv/_bn2, swish, static TF-SAME padding,
    BN eps 1e-3 momentum 0.01), block args r1_k3_s11_e1_i32_o16_se0.25 ...
  * resnet18/101: torchvision.models.resnet (BasicBlock / Bottleneck).
  * CamEncode / CamEncode_Resnet101 / BevEncode / Up: the reference's own
    lss_submodule.py (structure replicated, not copied).
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F
from torch import nn

EFFNET_B0_STAGES = (
    (3, 1, 1, 32, 16, 1),
    (3, 2, 6, 16, 24, 2),
    (5, 2, 6, 24, 40, 2),
    (3, 2, 6, 40, 80, 3),
    (5, 1, 6, 80, 112, 3),
    (5, 2, 6, 112, 192, 4),
    (3, 1, 6, 192, 320, 1),
)


def _swish(x):
    return x * torch.sigmoid(x)


class StaticSamePadConv2d(nn.Conv2d):
    """Conv2dStaticSamePadding for even feature sizes: pad k-s total,
    low = pad//2 (asymmetric for stride 2)."""

    def __init__(self, in_c, out_c, kernel, stride=1, groups=1, bias=False):
        super().__init__(in_c, out_c, kernel, stride=stride, groups=groups,
                         bias=bias, padding=0)
        pad = max(kernel - stride, 0)
        self._pad = (pad // 2, pad - pad // 2, pad // 2, pad - pad // 2)

    def forward(self, x):
        return super().forward(F.pad(x, self._pad))


def _eff_bn(c):
    return nn.BatchNorm2d(c, eps=1e-3, momentum=0.01)


class MBConvTwin(nn.Module):
    def __init__(self, in_c, out_c, kernel, stride, expand):
        super().__init__()
        mid = in_c * expand
        self.in_c, self.out_c, self.stride = in_c, out_c, stride
        self.expand = expand
        if expand != 1:
            self._expand_conv = nn.Conv2d(in_c, mid, 1, bias=False)
            self._bn0 = _eff_bn(mid)
        self._depthwise_conv = StaticSamePadConv2d(
            mid, mid, kernel, stride=stride, groups=mid
        )
        self._bn1 = _eff_bn(mid)
        se_c = max(1, int(in_c * 0.25))
        self._se_reduce = nn.Conv2d(mid, se_c, 1)
        self._se_expand = nn.Conv2d(se_c, mid, 1)
        self._project_conv = nn.Conv2d(mid, out_c, 1, bias=False)
        self._bn2 = _eff_bn(out_c)

    def forward(self, x, drop_connect_rate=None):
        inputs = x
        if self.expand != 1:
            x = _swish(self._bn0(self._expand_conv(x)))
        x = _swish(self._bn1(self._depthwise_conv(x)))
        s = F.adaptive_avg_pool2d(x, 1)
        s = self._se_expand(_swish(self._se_reduce(s)))
        x = torch.sigmoid(s) * x
        x = self._bn2(self._project_conv(x))
        if self.stride == 1 and self.in_c == self.out_c:
            # drop_connect is a no-op in eval mode (parity runs eval only)
            x = x + inputs
        return x


class _GlobalParams:
    drop_connect_rate = 0.2


class EfficientNetB0Twin(nn.Module):
    """state_dict-compatible stand-in for
    ``EfficientNet.from_pretrained("efficientnet-b0")`` (feature part)."""

    def __init__(self):
        super().__init__()
        self._conv_stem = StaticSamePadConv2d(3, 32, 3, stride=2)
        self._bn0 = _eff_bn(32)
        blocks = []
        for kernel, stride, expand, in_c, out_c, repeats in EFFNET_B0_STAGES:
            for r in range(repeats):
                blocks.append(
                    MBConvTwin(
                        in_c if r == 0 else out_c, out_c, kernel,
                        stride if r == 0 else 1, expand,
                    )
                )
        self._blocks = nn.ModuleList(blocks)
        # head tensors present in real checkpoints but unused by CamEncode
        self._conv_head = nn.Conv2d(320, 1280, 1, bias=False)
        self._bn1 = _eff_bn(1280)
        self._fc = nn.Linear(1280, 1000)
        self._global_params = _GlobalParams()

    def _swish(self, x):
        return _swish(x)


class UpTwin(nn.Module):
    """lss_submodule.Up: upsample(align_corners) + pad + concat + 2x conv."""

    def __init__(self, in_channels, out_channels, scale_factor=2):
        super().__init__()
        self.up = nn.Upsample(scale_factor=scale_factor, mode="bilinear",
                              align_corners=True)
        self.conv = nn.Sequential(
            nn.Conv2d(in_channels, out_channels, 3, padding=1, bias=False),
            nn.BatchNorm2d(out_channels),
            nn.ReLU(inplace=True),
            nn.Conv2d(out_channels, out_channels, 3, padding=1, bias=False),
            nn.BatchNorm2d(out_channels),
            nn.ReLU(inplace=True),
        )

    def forward(self, x1, x2):
        x1 = self.up(x1)
        dy = x2.size(2) - x1.size(2)
        dx = x2.size(3) - x1.size(3)
        x1 = F.pad(x1, [dx // 2, dx - dx // 2, dy // 2, dy - dy // 2])
        return self.conv(torch.cat([x2, x1], dim=1))


def bin_depths_twin(depth_map, mode, depth_min, depth_max, num_bins,
                    target=True):
    """utils/camera_utils.bin_depths (:247-299)."""
    if mode == "UD":
        bin_size = (depth_max - depth_min) / num_bins
        indices = (depth_map - depth_min) / bin_size
    elif mode == "LID":
        bin_size = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
        indices = -0.5 + 0.5 * torch.sqrt(
            1 + 8 * (depth_map - depth_min) / bin_size
        )
    else:
        raise NotImplementedError(mode)
    mask = (indices < 0) | (indices >= num_bins) | (~torch.isfinite(indices))
    indices[indices < 0] = 0
    indices[indices >= num_bins] = num_bins - 1
    indices[~torch.isfinite(indices)] = num_bins - 1
    indices = indices.long()
    if target:
        return indices, None
    return indices, ~mask


class CamEncodeTwin(nn.Module):
    """Reference CamEncode (lss_submodule.py:50-188), EfficientNet trunk."""

    def __init__(self, D, C, downsample, ddiscr, mode, use_gt_depth=False,
                 depth_supervision=True):
        super().__init__()
        self.D, self.C, self.downsample = D, C, downsample
        self.d_min, self.d_max, self.num_bins = ddiscr
        self.mode = mode
        self.use_gt_depth = use_gt_depth
        self.depth_supervision = depth_supervision
        self.chain_channels = 256
        self.trunk = EfficientNetB0Twin()
        self.up1 = UpTwin(320 + 112, self.chain_channels)
        if downsample == 8:
            self.up2 = UpTwin(self.chain_channels + 40, self.chain_channels)
        if not use_gt_depth:
            self.depth_head = nn.Conv2d(self.chain_channels, D, 1)
        self.image_head = nn.Conv2d(self.chain_channels, C, 1)

    def get_eff_features(self, x):
        endpoints = {}
        x = self.trunk._swish(self.trunk._bn0(self.trunk._conv_stem(x)))
        prev_x = x
        for idx, block in enumerate(self.trunk._blocks):
            x = block(x)
            if prev_x.size(2) > x.size(2):
                endpoints[f"reduction_{len(endpoints) + 1}"] = prev_x
            prev_x = x
        endpoints[f"reduction_{len(endpoints) + 1}"] = x
        x = self.up1(endpoints["reduction_5"], endpoints["reduction_4"])
        if self.downsample == 8:
            x = self.up2(x, endpoints["reduction_3"])
        return x

    def get_gt_depth_dist(self, x):
        target = self.training
        torch.clamp_max_(x, self.d_max)
        depth_indices, mask = bin_depths_twin(
            x, self.mode, self.d_min, self.d_max, self.num_bins, target=target
        )
        depth_indices = depth_indices[
            :, self.downsample // 2 :: self.downsample,
            self.downsample // 2 :: self.downsample,
        ]
        onehot = F.one_hot(depth_indices.long(), num_classes=self.num_bins
                           ).permute(0, 3, 1, 2)
        if not target:
            mask = mask[
                :, self.downsample // 2 :: self.downsample,
                self.downsample // 2 :: self.downsample,
            ].unsqueeze(1)
            onehot = onehot * mask
        return onehot, depth_indices

    def forward(self, x):
        features = self.get_eff_features(x[:, :3, :, :])
        x_img = self.image_head(features)
        if self.depth_supervision or self.use_gt_depth:
            depth_gt, depth_gt_indices = self.get_gt_depth_dist(x[:, 3, :, :])
        if self.use_gt_depth:
            return None, depth_gt.unsqueeze(1) * x_img.unsqueeze(2)
        depth_logit = self.depth_head(features)
        depth = F.softmax(depth_logit, dim=1)
        new_x = depth.unsqueeze(1) * x_img.unsqueeze(2)
        if self.depth_supervision:
            return (depth_logit, depth_gt_indices), new_x
        return None, new_x


class BottleneckTwin(nn.Module):
    def __init__(self, in_c, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(in_c, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


def _bottleneck_layer(in_c, planes, blocks, stride):
    ds = nn.Sequential(
        nn.Conv2d(in_c, planes * 4, 1, stride=stride, bias=False),
        nn.BatchNorm2d(planes * 4),
    )
    layers = [BottleneckTwin(in_c, planes, stride, ds)]
    for _ in range(1, blocks):
        layers.append(BottleneckTwin(planes * 4, planes))
    return nn.Sequential(*layers)


class CamEncodeResnet101Twin(nn.Module):
    """Reference CamEncode_Resnet101 (lss_submodule.py:191-309): truncated
    torchvision resnet101 (conv1..layer2) + 1x1 heads."""

    def __init__(self, D, C, downsample, ddiscr, mode, use_gt_depth=False,
                 depth_supervision=True):
        super().__init__()
        self.D, self.C, self.downsample = D, C, downsample
        self.d_min, self.d_max, self.num_bins = ddiscr
        self.mode = mode
        self.use_gt_depth = use_gt_depth
        self.depth_supervision = depth_supervision
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = _bottleneck_layer(64, 64, 3, 1)
        self.layer2 = _bottleneck_layer(256, 128, 4, 2)
        self.layer3 = nn.Identity()
        if not use_gt_depth:
            self.depth_head = nn.Conv2d(512, D, 1)
        self.image_head = nn.Conv2d(512, C, 1)

    def get_gt_depth_dist(self, x):
        return CamEncodeTwin.get_gt_depth_dist(self, x)

    def forward(self, x):
        f = self.conv1(x[:, :3, :, :].clone())
        f = self.maxpool(self.relu(self.bn1(f)))
        f = self.layer2(self.layer1(f))
        x_img = self.image_head(f)
        if self.depth_supervision or self.use_gt_depth:
            depth_gt, depth_gt_indices = self.get_gt_depth_dist(x[:, 3, :, :])
        if self.use_gt_depth:
            return None, depth_gt.unsqueeze(1) * x_img.unsqueeze(2)
        depth_logit = self.depth_head(f)
        depth = F.softmax(depth_logit, dim=1)
        new_x = depth.unsqueeze(1) * x_img.unsqueeze(2)
        if self.depth_supervision:
            return (depth_logit, depth_gt_indices), new_x
        return None, new_x


class BasicBlockTwin(nn.Module):
    def __init__(self, in_c, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(in_c, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


def _basic_layer(in_c, planes, blocks, stride):
    ds = None
    if stride != 1 or in_c != planes:
        ds = nn.Sequential(
            nn.Conv2d(in_c, planes, 1, stride=stride, bias=False),
            nn.BatchNorm2d(planes),
        )
    layers = [BasicBlockTwin(in_c, planes, stride, ds)]
    for _ in range(1, blocks):
        layers.append(BasicBlockTwin(planes, planes))
    return nn.Sequential(*layers)


class BevEncodeTwin(nn.Module):
    """Reference BevEncode (lss_submodule.py:312-349): resnet18 layers 1-3
    + Up(64+256) + upsample-conv head."""

    def __init__(self, inC, outC):
        super().__init__()
        self.conv1 = nn.Conv2d(inC, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.layer1 = _basic_layer(64, 64, 2, 1)
        self.layer2 = _basic_layer(64, 128, 2, 2)
        self.layer3 = _basic_layer(128, 256, 2, 2)
        self.up1 = UpTwin(64 + 256, 256, scale_factor=4)
        self.up2 = nn.Sequential(
            nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True),
            nn.Conv2d(256, 128, 3, padding=1, bias=False),
            nn.BatchNorm2d(128),
            nn.ReLU(inplace=True),
            nn.Conv2d(128, outC, 1),
        )

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x1 = self.layer1(x)
        x = self.layer3(self.layer2(x1))
        return self.up2(self.up1(x, x1))


def _depth_discretization(d_min, d_max, num_bins, mode):
    import numpy as np

    if mode == "UD":
        size = (d_max - d_min) / num_bins
        return d_min + size * np.arange(num_bins)
    if mode == "LID":
        size = 2 * (d_max - d_min) / (num_bins * (1 + num_bins))
        return d_min + size * (np.arange(num_bins) * np.arange(1, num_bins + 1)) / 2
    raise NotImplementedError(mode)


class LiftSplatShootEncoderTwin(nn.Module):
    """Reference LiftSplatShootEncoder (airv2x_encoder.py:31-335) on CPU:
    frustum/geometry/cumsum-trick voxel pooling + CamEncode + BevEncode."""

    def __init__(self, cfg):
        super().__init__()
        import numpy as np

        grid = cfg["grid_conf"]
        self.grid_conf = grid
        dx = torch.tensor([r[2] for r in (grid["xbound"], grid["ybound"],
                                          grid["zbound"])], dtype=torch.float)
        bx = torch.tensor([r[0] + r[2] / 2.0 for r in
                           (grid["xbound"], grid["ybound"], grid["zbound"])],
                          dtype=torch.float)
        nx = torch.tensor([int((r[1] - r[0]) / r[2] + 0.5) for r in
                           (grid["xbound"], grid["ybound"], grid["zbound"])],
                          dtype=torch.long)
        self.dx, self.bx, self.nx = dx, bx, nx
        self.downsample = cfg["img_downsample"]
        self.camC = cfg["img_features"]
        ogf_h, ogf_w = cfg["data_aug_conf"]["final_dim"]
        f_h, f_w = ogf_h // self.downsample, ogf_w // self.downsample
        ds = torch.tensor(
            _depth_discretization(*grid["ddiscr"], grid["mode"]),
            dtype=torch.float,
        ).view(-1, 1, 1).expand(-1, f_h, f_w)
        d = ds.shape[0]
        xs = torch.linspace(0, ogf_w - 1, f_w).view(1, 1, f_w).expand(d, f_h, f_w)
        ys = torch.linspace(0, ogf_h - 1, f_h).view(1, f_h, 1).expand(d, f_h, f_w)
        self.frustum = torch.stack((xs, ys, ds), -1)
        self.D = d
        enc = (CamEncodeTwin if cfg.get("camera_encoder", "EfficientNet")
               == "EfficientNet" else CamEncodeResnet101Twin)
        self.camencode = enc(
            self.D, self.camC, self.downsample, grid["ddiscr"], grid["mode"],
            cfg.get("use_depth_gt", False), cfg.get("depth_supervision", True),
        )
        self.bevencode = BevEncodeTwin(inC=self.camC, outC=cfg["bevout_feature"])

    def get_geometry(self, rots, trans, intrins, post_rots, post_trans):
        b, n, _ = trans.shape
        points = self.frustum - post_trans.view(b, n, 1, 1, 1, 3)
        points = torch.inverse(post_rots).view(b, n, 1, 1, 1, 3, 3).matmul(
            points.unsqueeze(-1)
        )
        points = torch.cat(
            (points[..., :2, :] * points[..., 2:3, :], points[..., 2:3, :]), 5
        )
        combine = rots.matmul(torch.inverse(intrins))
        points = combine.view(b, n, 1, 1, 1, 3, 3).matmul(points).squeeze(-1)
        points += trans.view(b, n, 1, 1, 1, 3)
        return points

    def voxel_pooling(self, geom_feats, x):
        b, n, d, h, w, c = x.shape
        nprime = b * n * d * h * w
        x = x.reshape(nprime, c)
        geom_feats = ((geom_feats - (self.bx - self.dx / 2.0)) / self.dx).long()
        geom_feats = geom_feats.view(nprime, 3)
        batch_ix = torch.cat(
            [torch.full([nprime // b, 1], ix, dtype=torch.long)
             for ix in range(b)]
        )
        geom_feats = torch.cat((geom_feats, batch_ix), 1)
        kept = (
            (geom_feats[:, 0] >= 0) & (geom_feats[:, 0] < self.nx[0])
            & (geom_feats[:, 1] >= 0) & (geom_feats[:, 1] < self.nx[1])
            & (geom_feats[:, 2] >= 0) & (geom_feats[:, 2] < self.nx[2])
        )
        x, geom_feats = x[kept], geom_feats[kept]
        ranks = (
            geom_feats[:, 0] * (self.nx[1] * self.nx[2] * b)
            + geom_feats[:, 1] * (self.nx[2] * b)
            + geom_feats[:, 2] * b
            + geom_feats[:, 3]
        )
        sorts = ranks.argsort()
        x, geom_feats, ranks = x[sorts], geom_feats[sorts], ranks[sorts]
        # cumsum trick
        x = x.cumsum(0)
        kept2 = torch.ones(x.shape[0], dtype=torch.bool)
        kept2[:-1] = ranks[1:] != ranks[:-1]
        x, geom_feats = x[kept2], geom_feats[kept2]
        x = torch.cat((x[:1], x[1:] - x[:-1]))
        final = torch.zeros((b, c, int(self.nx[2]), int(self.nx[1]),
                             int(self.nx[0])))
        final[geom_feats[:, 3], :, geom_feats[:, 2], geom_feats[:, 1],
              geom_feats[:, 0]] = x
        return torch.cat(final.unbind(dim=2), 1)

    def forward(self, image_inputs_dict):
        x, rots, trans, intrins, post_rots, post_trans = (
            image_inputs_dict["imgs"],
            image_inputs_dict["rots"],
            image_inputs_dict["trans"],
            image_inputs_dict["intrinsics"],
            image_inputs_dict["post_rots"],
            image_inputs_dict["post_trans"],
        )
        geom = self.get_geometry(rots, trans, intrins, post_rots, post_trans)
        b, n, c, im_h, im_w = x.shape
        flat = x.view(b * n, c, im_h, im_w)
        depth_items, feats = self.camencode(flat)
        feats = feats.view(b, n, self.camC, self.D, im_h // self.downsample,
                           im_w // self.downsample)
        feats = feats.permute(0, 1, 3, 4, 5, 2)
        bev = self.voxel_pooling(geom, feats)
        return self.bevencode(bev)
