"""BEV warp parity vs torch.nn.functional.grid_sample / affine_grid."""

import jax.numpy as jnp
import numpy as np
import pytest

from airv2x_tpu.ops import warp as W

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_warp_affine(src_nchw, M_2x3, dsize, align_corners=True):
    """Reference semantics: pixel affine -> normalized homography -> inverse
    -> affine_grid -> grid_sample (torch_transformation_utils.py:22-66)."""
    B, C, H, W_ = src_nchw.shape

    def normal_transform_pixel(h, w):
        m = torch.eye(3)
        m[0, 0] = 2.0 / max(w - 1, 1)
        m[1, 1] = 2.0 / max(h - 1, 1)
        m[0, 2] = -1.0
        m[1, 2] = -1.0
        return m

    pad = torch.zeros(B, 1, 3)
    pad[:, 0, 2] = 1.0
    m33 = torch.cat([M_2x3, pad], dim=1)
    src_norm = normal_transform_pixel(H, W_)
    dst_norm = normal_transform_pixel(dsize[0], dsize[1])
    dst_trans_src = dst_norm[None] @ m33 @ torch.inverse(src_norm)[None]
    src_trans_dst = torch.inverse(dst_trans_src)
    grid = F.affine_grid(
        src_trans_dst[:, :2, :], [B, C, dsize[0], dsize[1]],
        align_corners=align_corners,
    )
    return F.grid_sample(src_nchw, grid, align_corners=align_corners)


def test_identity_warp(rng):
    src = rng.normal(size=(2, 16, 24, 3)).astype(np.float32)
    M = np.tile(np.array([[1.0, 0, 0], [0, 1, 0]], np.float32), (2, 1, 1))
    out = np.asarray(W.warp_affine(jnp.asarray(src), jnp.asarray(M), (16, 24)))
    np.testing.assert_allclose(out, src, atol=1e-5)


@pytest.mark.parametrize("angle,tx,ty", [(0.3, 2.0, -1.5), (-0.7, 0.0, 3.0)])
def test_warp_matches_torch(rng, angle, tx, ty):
    src = rng.normal(size=(1, 20, 28, 4)).astype(np.float32)
    c, s = np.cos(angle), np.sin(angle)
    M = np.array([[[c, -s, tx], [s, c, ty]]], np.float32)

    ours = np.asarray(W.warp_affine(jnp.asarray(src), jnp.asarray(M), (20, 28)))
    theirs = (
        _torch_warp_affine(
            torch.from_numpy(src.transpose(0, 3, 1, 2)),
            torch.from_numpy(M),
            (20, 28),
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_warp_bev_features_identity_keeps_all(rng):
    feats = rng.normal(size=(1, 3, 12, 16, 2)).astype(np.float32)
    t = np.tile(np.eye(4, dtype=np.float32), (1, 3, 1, 1))
    out = np.asarray(
        W.warp_bev_features(jnp.asarray(feats), jnp.asarray(t), 0.4, 4)
    )
    np.testing.assert_allclose(out, feats, atol=1e-5)


def test_warp_translation_moves_features():
    # a feature spike at a known pixel moves by tx meters / (ratio*downsample)
    feats = np.zeros((1, 2, 16, 16, 1), np.float32)
    feats[0, 1, 8, 8, 0] = 1.0
    t = np.tile(np.eye(4, dtype=np.float32), (1, 2, 1, 1))
    t[0, 1, 0, 3] = 3.2  # 3.2 m -> 2 px at 0.4 * 4
    out = np.asarray(
        W.warp_bev_features(jnp.asarray(feats), jnp.asarray(t), 0.4, 4)
    )
    # the reference convention: affine x-axis is the W (cols) direction;
    # positive x translation shifts content left in sampled output
    assert out[0, 1].max() > 0.9
    yy, xx = np.unravel_index(np.argmax(out[0, 1, :, :, 0]), (16, 16))
    assert (yy, xx) != (8, 8)


def test_roi_mask_identity_full():
    t = np.tile(np.eye(4, dtype=np.float32), (1, 2, 1, 1))
    roi = np.asarray(W.rotated_roi_mask((10, 12), jnp.asarray(t), 0.4, 4))
    assert roi.shape == (1, 2, 10, 12)
    assert roi.all()


def test_roi_mask_large_shift_partial():
    t = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1, 1))
    t[0, 0, 0, 3] = 8.0  # 8 m = 5 px of 12
    roi = np.asarray(W.rotated_roi_mask((10, 12), jnp.asarray(t), 0.4, 4))
    assert roi.sum() < 10 * 12
    assert roi.sum() > 0
