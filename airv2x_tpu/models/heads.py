"""Task heads: detection (cls / reg / obj 1x1 convs) and BEV segmentation.

Detection heads mirror the per-model 1x1 convs of the reference
(e.g. models/airv2x_where2com.py:59-69). The segmentation head mirrors
task_heads/segmentation_head.py:11-148: crop/pad the BEV feature to the
square segmentation extent and bilinear-resize to ``seg_hw``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class DetectionHeads(nn.Module):
    anchor_number: int
    num_class: int
    obj_head: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = {
            "psm": nn.Conv(
                self.anchor_number * self.num_class, (1, 1), dtype=self.dtype,
                name="cls_head",
            )(x),
            "rm": nn.Conv(
                7 * self.anchor_number, (1, 1), dtype=self.dtype, name="reg_head"
            )(x),
        }
        if self.obj_head:
            out["obj"] = nn.Conv(
                self.anchor_number, (1, 1), dtype=self.dtype, name="obj_head"
            )(x)
        return out


def _bilinear_resize(x, hw):
    """Bilinear resize via the repo's gather-based grid sampler.

    ``jax.image.resize``'s transposed-gather backward SIGABRTs the TPU
    compiler in this image when composed into the full seg training graph;
    grid_sample_bilinear differentiates through plain gathers, which the
    compiler handles.
    """
    from airv2x_tpu.ops.warp import grid_sample_bilinear

    h, w = x.shape[-3], x.shape[-2]
    # half-pixel centers, clamped to the border (edge semantics like
    # jax.image.resize rather than zero padding)
    ys = jnp.clip((jnp.arange(hw, dtype=jnp.float32) + 0.5) * (h / hw) - 0.5,
                  0.0, h - 1.0)
    xs = jnp.clip((jnp.arange(hw, dtype=jnp.float32) + 0.5) * (w / hw) - 0.5,
                  0.0, w - 1.0)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    lead = x.shape[:-3]
    flat = x.reshape((-1,) + x.shape[-3:])
    out = jax.vmap(lambda im: grid_sample_bilinear(im, gx, gy))(flat)
    return out.reshape(lead + (hw, hw, x.shape[-1]))


class BevSegHead(nn.Module):
    """Dynamic + static segmentation logits on a square seg grid.

    seg_branch: 'dynamic' | 'static' | 'both'. The BEV feature covers
    ``cav_range`` at its own resolution; the seg map covers a centered square
    of half-size ``seg_hw * seg_res / 2`` meters — the feature map is cropped
    (or zero-padded) to that extent before resizing, following the
    reference's crop/pad + interpolate scheme.
    """

    seg_branch: str
    seg_hw: int
    dynamic_class: int
    static_class: int
    seg_res: float
    cav_range: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_features: bool = False):
        # x: (B, H, W, C) covering cav_range ([xmin ymin zmin xmax ymax zmax])
        b, h, w, c = x.shape
        extent_m = self.seg_hw * self.seg_res  # meters covered by seg map
        range_x = self.cav_range[3] - self.cav_range[0]
        range_y = self.cav_range[4] - self.cav_range[1]
        # feature-map pixels per meter; rows ~ y, cols ~ x (scatter orientation)
        px_per_m_y = h / range_y
        px_per_m_x = w / range_x
        crop_h = int(round(extent_m * px_per_m_y))
        crop_w = int(round(extent_m * px_per_m_x))

        def crop_or_pad(t, size, axis):
            cur = t.shape[axis]
            if cur >= size:
                start = (cur - size) // 2
                return jax.lax.slice_in_dim(t, start, start + size, axis=axis)
            pad = size - cur
            cfg = [(0, 0)] * t.ndim
            cfg[axis] = (pad // 2, pad - pad // 2)
            return jnp.pad(t, cfg)

        x = crop_or_pad(x, crop_h, axis=1)
        x = crop_or_pad(x, crop_w, axis=2)

        out = {}
        if self.seg_branch in ("dynamic", "both"):
            # dynamic_class already includes the background class
            # (task_heads/segmentation_head.py:21-23 with the shipped
            # ``dynamic_class: 7`` = bg + 6 foreground, matching the 7-way
            # [1.]+d_weights CE of vanilla_seg_loss.py:30-33)
            dyn = nn.Conv(self.dynamic_class, (1, 1), dtype=self.dtype,
                          name="dynamic_head")(x)
            out["dynamic_seg"] = _bilinear_resize(dyn, self.seg_hw)
        if self.seg_branch in ("static", "both"):
            sta = nn.Conv(self.static_class, (1, 1), dtype=self.dtype,
                          name="static_head")(x)
            out["static_seg"] = _bilinear_resize(sta, self.seg_hw)
        if return_features:
            return out, x
        return out
