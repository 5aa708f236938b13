"""Binary-class PointPillar loss for the OPV2V family.

Twin of loss/point_pillar_loss.py (focal objectness over a single score per
anchor + weighted smooth-L1 with sin-difference yaw), sharing the helpers of
the multiclass variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from airv2x_tpu.loss.point_pillar_multiclass import (
    add_sin_difference,
    sigmoid_ce,
    smooth_l1,
)
from airv2x_tpu.loss.registry import register_loss


@register_loss("point_pillar_loss", "point_pillar_loss_opencood")
def make_binary_loss(args: dict):
    cls_weight = float(args.get("cls_weight", 1.0))
    reg_coe = float(args.get("reg", 2.0))
    alpha, gamma = 0.25, 2.0

    def loss_fn(output: dict, target: dict, prefix: str = ""):
        psm = output[f"psm{prefix}"].astype(jnp.float32)  # (B, H, W, A)
        rm = output[f"rm{prefix}"].astype(jnp.float32)  # (B, H, W, 7A)
        pos = target["pos_equal_one"]
        b = psm.shape[0]

        flat_pos = pos.reshape(b, -1)
        positives = flat_pos > 0
        negatives = flat_pos == 0
        cls_w = (negatives + 1.0 * positives).astype(jnp.float32)
        reg_w = positives.astype(jnp.float32)
        pos_norm = jnp.clip(jnp.sum(positives, axis=1, keepdims=True), 1.0, None)
        cls_w = cls_w / pos_norm
        reg_w = reg_w / pos_norm

        logits = psm.reshape(b, -1)
        tgt_cls = flat_pos.astype(jnp.float32)
        pred_sig = jax.nn.sigmoid(logits)
        alpha_w = tgt_cls * alpha + (1 - tgt_cls) * (1 - alpha)
        pt = tgt_cls * (1 - pred_sig) + (1 - tgt_cls) * pred_sig
        focal = alpha_w * pt**gamma * sigmoid_ce(logits, tgt_cls) * cls_w
        conf_loss = jnp.sum(focal) / b * cls_weight

        tgt = target["targets"].reshape(b, -1, 7)
        pred = rm.reshape(b, -1, 7)
        sp, st = add_sin_difference(pred[..., 6], tgt[..., 6])
        pred = jnp.concatenate([pred[..., :6], sp[..., None]], axis=-1)
        tgt = jnp.concatenate([tgt[..., :6], st[..., None]], axis=-1)
        loc = smooth_l1(pred - tgt) * reg_w[..., None]
        reg_loss = jnp.sum(loc) / b * reg_coe

        total = conf_loss + reg_loss
        return total, {
            f"total_loss{prefix}": total,
            f"conf_loss{prefix}": conf_loss,
            f"reg_loss{prefix}": reg_loss,
        }

    return loss_fn


@register_loss("point_pillar_loss_coalign")
def make_coalign_loss(args: dict):
    """Detection loss + rotated-IoU regression term on positive anchors
    (loss/point_pillar_loss_coalign.py twin — the reference computes it with
    the CUDA iou3d kernel; here it is the same XLA rotated-IoU op used by
    NMS, so the loss is natively differentiable)."""
    base = make_binary_loss(args)
    iou_weight = float(args.get("iou_weight", 1.0))

    def loss_fn(output: dict, target: dict, prefix: str = ""):
        total, parts = base(output, target, prefix)
        if "anchors" in target:
            from airv2x_tpu.ops import geometry as geo
            from airv2x_tpu.ops.boxes import decode_boxes
            from airv2x_tpu.ops.rotated_iou import elementwise_quad_iou

            rm = output[f"rm{prefix}"].astype(jnp.float32)
            b = rm.shape[0]
            anchors = target["anchors"].reshape(-1, 7)
            pred = decode_boxes(rm.reshape(b, -1, 7), anchors[None])
            gt = decode_boxes(
                target["targets"].reshape(b, -1, 7).astype(jnp.float32),
                anchors[None],
            )
            pc = geo.boxes_to_corners_bev(pred, order="hwl")
            gc = geo.boxes_to_corners_bev(gt, order="hwl")
            iou = elementwise_quad_iou(pc, gc)  # (B, N)
            pos = target["pos_equal_one"].reshape(b, -1)
            iou_loss = jnp.sum((1.0 - iou) * pos) / jnp.maximum(
                jnp.sum(pos), 1.0
            )
            total = total + iou_weight * iou_loss
            parts = dict(parts)
            parts["iou_loss"] = iou_loss
            parts[f"total_loss{prefix}"] = total
        return total, parts

    return loss_fn


@register_loss("point_pillar_loss_mdd")
def make_mdd_loss(args: dict):
    """Detection loss + denoised-feature MSE (loss/point_pillar_loss_mdd.py
    :153-178 twin): ``((gt_feature - pred_feature)**2).sum(channel).mean()``
    scaled by the epoch schedule ``sigmoid_weight(3, epoch) =
    1.5 * (1 - tanh(epoch/4 - 5))`` (:92-93,156-158; weight 0 at eval).
    The epoch rides in ``target["epoch"]`` (default 1)."""
    base = make_binary_loss(args)

    def loss_fn(output: dict, target: dict, prefix: str = ""):
        total, parts = base(output, target, prefix)
        if "pred_feature" in output and "gt_feature" in output:
            epoch = jnp.asarray(target.get("epoch", 1), jnp.float32)
            weight = 3.0 / 2.0 * (-jnp.tanh(epoch / 4.0 - 5.0) + 1.0)
            p = output["pred_feature"].astype(jnp.float32)
            g = output["gt_feature"].astype(jnp.float32)
            diff_loss = jnp.mean(jnp.sum((g - p) ** 2, axis=-1)) * weight
            total = total + diff_loss
            parts = dict(parts)
            parts["diff_loss"] = diff_loss
            parts[f"total_loss{prefix}"] = total
        return total, parts

    return loss_fn


@register_loss("point_pillar_disconet_loss")
def make_disconet_loss(args: dict):
    """DiscoNet knowledge distillation (loss/point_pillar_disconet_loss.py):
    detection loss + KL divergence between per-pixel student and teacher
    feature distributions (softmax over channels)."""
    base = make_binary_loss(args)
    kd_weight = float(args.get("kd", {}).get("weight", 1e5)) if isinstance(
        args.get("kd"), dict
    ) else float(args.get("kd_weight", 1.0))

    def loss_fn(output: dict, target: dict, prefix: str = ""):
        total, parts = base(output, target, prefix)
        if "student_feature" in output and "teacher_feature" in output:
            s = jax.nn.log_softmax(
                output["student_feature"].astype(jnp.float32), axis=-1
            )
            t = jax.nn.softmax(output["teacher_feature"].astype(jnp.float32), axis=-1)
            kd = jnp.mean(jnp.sum(t * (jnp.log(t + 1e-9) - s), axis=-1))
            total = total + kd_weight * kd
            parts = dict(parts)
            parts["kd_loss"] = kd
            parts[f"total_loss{prefix}"] = total
        return total, parts

    return loss_fn
