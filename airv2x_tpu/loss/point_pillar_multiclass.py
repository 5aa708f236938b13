"""Multiclass PointPillar detection loss (device, pure fn).

Behavioural twin of loss/point_pillar_loss_multiclass.py:78-298:
  * per-anchor multiclass focal loss (alpha 0.25, gamma 2) on sigmoid logits
    against one-hot class targets, weighted by (pos + all-neg)/num_pos;
  * weighted smooth-L1 (beta 1/9) regression with sin-difference yaw
    encoding, weighted by pos/num_pos;
  * plain BCE objectness against the positive mask (mean over the map).

Faithfully reproduces the reference's normalization quirks (the focal term
is divided by batch size twice: once inside cls_loss_func :215 and once at
:145) so training dynamics match.

Layout differences: predictions are NHWC; targets follow ops.anchors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from airv2x_tpu.loss.registry import register_loss


def sigmoid_ce(logits, targets):
    return (
        jnp.clip(logits, 0, None)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def smooth_l1(diff, beta=1.0 / 9.0):
    n = jnp.abs(diff)
    return jnp.where(n < beta, 0.5 * n**2 / beta, n - 0.5 * beta)


def add_sin_difference(pred_yaw, tgt_yaw):
    return jnp.sin(pred_yaw) * jnp.cos(tgt_yaw), jnp.cos(pred_yaw) * jnp.sin(tgt_yaw)


@register_loss("point_pillar_loss_multiclass")
def make_multiclass_loss(args: dict):
    cls_weight = float(args["cls_weight"])
    reg_coe = float(args["reg"])
    num_class = int(args["num_class"])
    # default 1.0 keeps the reference's plain-mean objectness BCE; configs may
    # raise it to speed up obj-score calibration (positives are ~0.1-0.3% of
    # anchors, so the plain mean learns the prior first)
    obj_weight = float(args.get("obj_weight", 1.0))
    alpha, gamma = 0.25, 2.0

    def loss_fn(output: dict, target: dict, prefix: str = ""):  # noqa: C901
        psm = output[f"psm{prefix}"].astype(jnp.float32)  # (B, H, W, A*C)
        rm = output[f"rm{prefix}"].astype(jnp.float32)  # (B, H, W, 7A)
        obj = output[f"obj{prefix}"].astype(jnp.float32)  # (B, H, W, A)

        pos = target["pos_equal_one"]  # (B, H, W, A)
        b = psm.shape[0]
        a = pos.shape[-1]

        flat_pos = pos.reshape(b, -1)
        positives = flat_pos > 0
        negatives = flat_pos == 0
        cls_w = (negatives + 1.0 * positives).astype(jnp.float32)
        reg_w = positives.astype(jnp.float32)
        pos_norm = jnp.clip(jnp.sum(positives, axis=1, keepdims=True), 1.0, None)
        cls_w = cls_w / pos_norm
        reg_w = reg_w / pos_norm

        # --- multiclass focal cls ---
        cls_ids = target["class_ids"].astype(jnp.int32)  # (B, H, W, A)
        one_hot = jax.nn.one_hot(cls_ids, num_class, dtype=psm.dtype)
        hw = pos.shape[1:3]
        logits = psm.reshape(b, *hw, a, num_class)
        pred_sig = jax.nn.sigmoid(logits)
        alpha_w = one_hot * alpha + (1 - one_hot) * (1 - alpha)
        pt = one_hot * (1 - pred_sig) + (1 - one_hot) * pred_sig
        focal = alpha_w * pt**gamma * sigmoid_ce(logits, one_hot)
        focal = focal * cls_w.reshape(b, *hw, a, 1)
        # reference double-normalization: sum/B inside, /B outside
        conf_loss = (jnp.sum(focal) / b / b) * cls_weight

        # --- regression ---
        tgt = target["targets"].reshape(b, -1, 7)
        pred = rm.reshape(b, -1, 7)
        sp, st = add_sin_difference(pred[..., 6], tgt[..., 6])
        pred = jnp.concatenate([pred[..., :6], sp[..., None]], axis=-1)
        tgt = jnp.concatenate([tgt[..., :6], st[..., None]], axis=-1)
        loc = smooth_l1(pred - tgt) * reg_w[..., None]
        reg_loss = jnp.sum(loc) / b * reg_coe

        # --- objectness BCE ---
        obj_sig = jax.nn.sigmoid(obj)
        bce = -(
            pos * jnp.log(obj_sig + 1e-6) + (1 - pos) * jnp.log(1 - obj_sig + 1e-6)
        )
        obj_loss = jnp.mean(bce) * obj_weight

        total = reg_loss + conf_loss + obj_loss
        return total, {
            f"total_loss{prefix}": total,
            f"reg_loss{prefix}": reg_loss,
            f"conf_loss{prefix}": conf_loss,
            f"obj_loss{prefix}": obj_loss,
        }

    return loss_fn
