"""Minimal REAL torch backend for the ``spconv.pytorch`` stub.

spconv is not installed in this image, so — like the camera trunks
(tests/torch_camera_twins.py, the round-2-sanctioned pattern) — the
reference's actual RTNH code (opencood/models/RTNH_modules/rdr_sp_pw.py)
is executed against a dense-emulation twin that implements spconv's
documented semantics:

  * ``SparseConvTensor``: COO (features (N, C), indices (N, 4) [b,z,y,x]);
    ``.dense()`` zero-fills inactive sites -> (B, C, Z, Y, X).
  * ``SparseConv3d``: regular sparse conv — output active set is the
    geometric dilation of the input active set (any active input in the
    receptive field); values = dense conv over the zero-filled grid
    (+ bias at active output sites).
  * ``SubMConv3d``: submanifold conv — output sites == input sites,
    centered SAME geometry (the ``padding`` argument is ignored, as in
    spconv); values = dense conv at the input sites (+ bias).
  * indice_key reuse with mismatched geometry (the reference reuses
    ``sp0`` between a k=1 and a k=3 conv) is resolved per-conv, matching
    airv2x_tpu/models/sparse3d.py's documented semantics.

Weights are stored as (out, in, kz, ky, kx) so ``F.conv3d`` consumes them
directly and ``utils/torch_convert.conv_kernel`` converts them.
"""

from __future__ import annotations

import sys

import torch
import torch.nn as nn
import torch.nn.functional as F


class SparseConvTensor:
    def __init__(self, features, indices, spatial_shape, batch_size):
        self.features = features
        self.indices = indices.long()
        self.spatial_shape = list(spatial_shape)
        self.batch_size = int(batch_size)

    def replace_feature(self, feats):
        return SparseConvTensor(
            feats, self.indices, self.spatial_shape, self.batch_size
        )

    def dense(self):
        z, y, x = self.spatial_shape
        c = self.features.shape[1]
        out = self.features.new_zeros((self.batch_size, c, z, y, x))
        b, iz, iy, ix = self.indices.unbind(1)
        out[b, :, iz, iy, ix] = self.features
        return out

    def occupancy(self):
        z, y, x = self.spatial_shape
        occ = self.features.new_zeros((self.batch_size, 1, z, y, x))
        b, iz, iy, ix = self.indices.unbind(1)
        occ[b, 0, iz, iy, ix] = 1.0
        return occ


def _triple(v):
    return (v, v, v) if isinstance(v, int) else tuple(v)


class _SparseConvBase(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, indice_key=None, bias=True):
        super().__init__()
        assert _triple(dilation) == (1, 1, 1)
        self.kernel_size = _triple(kernel_size)
        self.stride = _triple(stride)
        self.padding = _triple(padding)
        self.indice_key = indice_key
        self.weight = nn.Parameter(
            torch.empty(out_channels, in_channels, *self.kernel_size)
        )
        nn.init.kaiming_uniform_(self.weight, a=5 ** 0.5)
        if bias:
            self.bias = nn.Parameter(torch.zeros(out_channels))
        else:
            self.register_parameter("bias", None)


class SparseConv3d(_SparseConvBase):
    def forward(self, x: SparseConvTensor) -> SparseConvTensor:
        dense = x.dense()
        y = F.conv3d(dense, self.weight, None, self.stride, self.padding)
        ones = self.weight.new_ones((1, 1) + self.kernel_size)
        occ = F.conv3d(x.occupancy(), ones, None, self.stride, self.padding)
        idx = (occ[:, 0] > 0.5).nonzero()  # (M, 4) [b, z, y, x]
        b, iz, iy, ix = idx.unbind(1)
        feats = y[b, :, iz, iy, ix]
        if self.bias is not None:
            feats = feats + self.bias
        return SparseConvTensor(
            feats, idx.int(), list(y.shape[2:]), x.batch_size
        )


class SubMConv3d(_SparseConvBase):
    def forward(self, x: SparseConvTensor) -> SparseConvTensor:
        pad = tuple((k - 1) // 2 for k in self.kernel_size)
        y = F.conv3d(x.dense(), self.weight, None, (1, 1, 1), pad)
        b, iz, iy, ix = x.indices.unbind(1)
        feats = y[b, :, iz, iy, ix]
        if self.bias is not None:
            feats = feats + self.bias
        return SparseConvTensor(
            feats, x.indices.int(), x.spatial_shape, x.batch_size
        )


class PointToVoxel:
    """Constructor-compatible placeholder: the parity tests feed voxel
    dicts directly (the reference model consumes pre-voxelized input)."""

    def __init__(self, **kwargs):
        self.kwargs = kwargs


def install_spconv_backend():
    """Give the permissive ``spconv`` stubs this real dense-emulation
    backend, and re-bind names in already-imported reference modules."""
    import types

    sp = sys.modules.get("spconv") or types.ModuleType("spconv")
    spp = sys.modules.get("spconv.pytorch") or types.ModuleType(
        "spconv.pytorch"
    )
    sppu = sys.modules.get("spconv.pytorch.utils") or types.ModuleType(
        "spconv.pytorch.utils"
    )
    for m in (spp,):
        m.SparseConv3d = SparseConv3d
        m.SubMConv3d = SubMConv3d
        m.SparseConvTensor = SparseConvTensor
    sppu.PointToVoxel = PointToVoxel
    spp.utils = sppu
    sp.pytorch = spp
    sys.modules["spconv"] = sp
    sys.modules["spconv.pytorch"] = spp
    sys.modules["spconv.pytorch.utils"] = sppu

    # rdr_spcube_head imports `nms` and a CUDA vertex sorter at module
    # scope; both are dead code under the V2XR_RTNH wiring (the head's
    # forward is two 1x1 convs).
    nms_mod = sys.modules.get("nms") or types.ModuleType("nms")
    sys.modules["nms"] = nms_mod
    co = sys.modules.get("opencood.utils.cuda_op") or types.ModuleType(
        "opencood.utils.cuda_op"
    )
    if not hasattr(co, "sort_vertices"):
        co.sort_vertices = None
    sys.modules["opencood.utils.cuda_op"] = co

    for name, mod in list(sys.modules.items()):
        if name.startswith("opencood.models.RTNH_modules") and mod:
            if hasattr(mod, "spconv"):
                mod.spconv = spp
