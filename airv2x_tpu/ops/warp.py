"""BEV affine warping (grid-sample) — the agent->ego feature projection op.

Twin of the reference's kornia-derived stack
(models/common_modules/torch_transformation_utils.py:116-447:
get_discretized_transformation_matrix, get_transformation_matrix,
normalize_homography, warp_affine[_simple]) built on one primitive:
``grid_sample_bilinear`` (zero-padded bilinear gather), verified against
torch.nn.functional.grid_sample in tests.

Layout: channel-last (..., H, W, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_bilinear(src, grid_x, grid_y):
    """Bilinear sample of ``src`` (H, W, C) at pixel coords (out_h, out_w).

    Out-of-bounds reads contribute zero (torch padding_mode='zeros').
    grid_x/grid_y: (out_h, out_w) float pixel coordinates into src.
    """
    h, w = src.shape[0], src.shape[1]
    x0 = jnp.floor(grid_x)
    y0 = jnp.floor(grid_y)
    tx = (grid_x - x0)[..., None]
    ty = (grid_y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = src[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return v * inside[..., None].astype(src.dtype)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    return top * (1 - ty) + bot * ty


def warp_affine(src, M, dsize, align_corners: bool = True):
    """Warp (..., H, W, C) features by pixel-affine ``M`` (..., 2, 3).

    Follows reference warp_affine (torch_transformation_utils.py:22-66):
    the output at dst pixel p samples src at ``norm^-1 @ A^-1 @ norm @ p``
    where A is the (2, 3) pixel affine from get_transformation_matrix.
    """
    out_h, out_w = dsize
    lead = src.shape[:-3]
    ms = M.reshape((-1, 2, 3)).astype(jnp.float32)
    srcs = src.reshape((-1,) + src.shape[-3:])

    # The reference's normalize -> 3x3 invert -> denormalize chain is
    # algebraically the pixel-space inverse affine (align_corners=True makes
    # the normalizations cancel exactly); invert the 2x3 analytically.
    r = ms[:, :, :2]  # (N, 2, 2)
    t = ms[:, :, 2]  # (N, 2)
    det = r[:, 0, 0] * r[:, 1, 1] - r[:, 0, 1] * r[:, 1, 0]
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    r_inv = (
        jnp.stack(
            [
                jnp.stack([r[:, 1, 1], -r[:, 0, 1]], axis=-1),
                jnp.stack([-r[:, 1, 0], r[:, 0, 0]], axis=-1),
            ],
            axis=-2,
        )
        * inv_det[:, None, None]
    )
    t_inv = -(r_inv @ t[..., None])[..., 0]  # (N, 2)

    ys, xs = jnp.meshgrid(
        jnp.arange(out_h, dtype=jnp.float32),
        jnp.arange(out_w, dtype=jnp.float32),
        indexing="ij",
    )

    def one(ri, ti, s):
        sx = ri[0, 0] * xs + ri[0, 1] * ys + ti[0]
        sy = ri[1, 0] * xs + ri[1, 1] * ys + ti[1]
        return grid_sample_bilinear(s, sx, sy)

    out = jax.vmap(one)(r_inv, t_inv, srcs)
    return out.reshape(lead + (out_h, out_w, src.shape[-1]))


def warp_affine_normalized(src, M, align_corners: bool = False):
    """Warp (..., H, W, C) by an affine given in *normalized* coordinates.

    Twin of reference warp_affine_simple (torch_transformation_utils.py:
    warp_affine_simple): the (2, 3) matrix maps dst normalized coords in
    [-1, 1] directly to src normalized coords (torch F.affine_grid
    convention, default align_corners=False).
    """
    h, w = src.shape[-3], src.shape[-2]
    lead = src.shape[:-3]
    ms = M.reshape((-1, 2, 3)).astype(jnp.float32)
    srcs = src.reshape((-1,) + src.shape[-3:])

    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    if align_corners:
        gx = 2.0 * xs / max(w - 1, 1) - 1.0
        gy = 2.0 * ys / max(h - 1, 1) - 1.0
    else:
        gx = (2.0 * xs + 1.0) / w - 1.0
        gy = (2.0 * ys + 1.0) / h - 1.0

    def one(m, s):
        sxn = m[0, 0] * gx + m[0, 1] * gy + m[0, 2]
        syn = m[1, 0] * gx + m[1, 1] * gy + m[1, 2]
        if align_corners:
            sx = (sxn + 1.0) * 0.5 * (w - 1)
            sy = (syn + 1.0) * 0.5 * (h - 1)
        else:
            sx = ((sxn + 1.0) * w - 1.0) * 0.5
            sy = ((syn + 1.0) * h - 1.0) * 0.5
        return grid_sample_bilinear(s, sx, sy)

    out = jax.vmap(one)(ms, srcs)
    return out.reshape(lead + (h, w, src.shape[-1]))


def normalized_pairwise_affine(
    pairwise_t, h: int, w: int, discrete_ratio: float, downsample_rate: float
):
    """(..., 4, 4) SE(3) -> (..., 2, 3) normalized-coordinate affine.

    Twin of the inline conversion used by fusion_in_one / v2v_fuse /
    when2com (v2v_fuse.py:86-104): planar block with aspect-corrected
    off-diagonals and translations scaled to [-1, 1] extents.
    """
    m = pairwise_t[..., :2, :][..., :, [0, 1, 3]]  # (..., 2, 3)
    a00 = m[..., 0, 0]
    a01 = m[..., 0, 1] * h / w
    a10 = m[..., 1, 0] * w / h
    a11 = m[..., 1, 1]
    t0 = m[..., 0, 2] / (downsample_rate * discrete_ratio * w) * 2.0
    t1 = m[..., 1, 2] / (downsample_rate * discrete_ratio * h) * 2.0
    row0 = jnp.stack([a00, a01, t0], axis=-1)
    row1 = jnp.stack([a10, a11, t1], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def discretized_transform(pairwise_t, discrete_ratio: float, downsample_rate: float):
    """(..., 4, 4) SE(3) -> (..., 2, 3) pixel-level planar affine.

    Twin of get_discretized_transformation_matrix (:116-144): keep the
    planar rotation block and convert xy translation from meters to feature
    pixels.
    """
    rot = pairwise_t[..., :2, :2]
    t = pairwise_t[..., :2, 3:4] / (discrete_ratio * downsample_rate)
    return jnp.concatenate([rot, t], axis=-1)


def center_pixel_affine(M, dsize):
    """Recenter the (..., 2, 3) affine's rotation about the image center and
    keep its translation — twin of get_transformation_matrix (:293-310)."""
    h, w = dsize
    cx, cy = w / 2.0, h / 2.0
    r = M[..., :2, :2]
    # shift @ rot @ shift_inv: t' = c - R c
    c = jnp.asarray([cx, cy], M.dtype)
    t_center = c - (r @ c[:, None])[..., 0]
    t = M[..., :2, 2] + t_center
    return jnp.concatenate([r, t[..., None]], axis=-1)


def warp_bev_features(feats, pairwise_t, discrete_ratio, downsample_rate):
    """Warp (B, L, H, W, C) agent features into the ego frame, ego untouched.

    Twin of STTF (v2xvit_basic.py:17-38).
    """
    h, w = feats.shape[-3], feats.shape[-2]
    m = discretized_transform(pairwise_t, discrete_ratio, downsample_rate)
    m = center_pixel_affine(m, (h, w))
    warped = warp_affine(feats[:, 1:], m[:, 1:], (h, w))
    return jnp.concatenate([feats[:, :1], warped], axis=1)


def rotated_roi_mask(shape_hw, pairwise_t, discrete_ratio, downsample_rate):
    """(B, L) of (H, W) masks: dst pixels that map inside the source canvas
    after warping — twin of get_rotated_roi inside get_roi_and_cav_mask
    (torch_transformation_utils.py:330-369)."""
    h, w = shape_hw
    b, l = pairwise_t.shape[:2]
    ones = jnp.ones((b, l, h, w, 1), jnp.float32)
    m = discretized_transform(pairwise_t, discrete_ratio, downsample_rate)
    m = center_pixel_affine(m, (h, w))
    warped = warp_affine(ones, m, (h, w))
    return (warped[..., 0] > 0.5)
