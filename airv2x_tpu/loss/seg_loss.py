"""BEV segmentation loss (twin of loss/vanilla_seg_loss.py:7-118).

Class-weighted cross entropy on the dynamic (1 + d classes) and static
(weights [1, s, l]) branches, combined as
``d_coe * dynamic + s_coe * static``. Predictions NHWC, labels (B, H, W)
int. Torch CrossEntropyLoss with class weights normalizes by the sum of the
per-pixel target-class weights — reproduced here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from airv2x_tpu.loss.registry import register_loss


def weighted_ce(logits, labels, class_weights):
    """Torch-style weighted CE: sum(w_y * nll) / sum(w_y)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = class_weights[labels]
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-9)


@register_loss("vanilla_seg_loss")
def make_seg_loss(args: dict):
    seg_branch = args["seg_branch"]
    d_weights = list(args["d_weights"])
    s_weights = float(args["s_weights"])
    l_weights = float(args.get("l_weights", 50.0))
    d_coe = float(args["d_coe"])
    s_coe = float(args["s_coe"])

    dyn_w = jnp.asarray([1.0] + d_weights, jnp.float32)
    sta_w = jnp.asarray([1.0, s_weights, l_weights], jnp.float32)

    def loss_fn(output: dict, target: dict, prefix: str = ""):
        dynamic_loss = jnp.asarray(0.0)
        static_loss = jnp.asarray(0.0)
        if seg_branch in ("dynamic", "both"):
            dynamic_loss = weighted_ce(
                output["dynamic_seg"].astype(jnp.float32),
                target["dynamic_seg_label"].astype(jnp.int32),
                dyn_w,
            )
        if seg_branch in ("static", "both"):
            static_loss = weighted_ce(
                output["static_seg"].astype(jnp.float32),
                target["static_seg_label"].astype(jnp.int32),
                sta_w,
            )
        total = d_coe * dynamic_loss + s_coe * static_loss
        return total, {
            "total_loss": total,
            "dynamic_loss": dynamic_loss,
            "static_loss": static_loss,
        }

    return loss_fn


@register_loss("focal_seg_loss", "focal_seg_loss_sicp")
def make_focal_seg_loss(args: dict):
    """Multi-class focal loss on both seg branches (loss/focal_seg_loss.py
    :27-98; the _sicp twin differs only in logging). ``use_ce`` falls back
    to plain cross entropy; ``alpha`` is a per-class weight list or a
    scalar applied to every non-background class."""
    import jax
    import jax.numpy as jnp

    gamma = float(args["gamma"])
    alpha = args.get("alpha")
    reduction = args.get("reduction", "mean")
    ignore_index = args.get("ignore_index")
    use_ce = bool(args.get("use_ce", False))

    def branch_loss(logits, target):
        logits = logits.astype(jnp.float32)
        target = target.astype(jnp.int32)
        logpt = jax.nn.log_softmax(logits, axis=-1)  # (B, H, W, C)
        if use_ce:
            nll = -jnp.take_along_axis(logpt, target[..., None], -1)[..., 0]
            return jnp.mean(nll)
        pt = jnp.clip(jnp.exp(logpt), 1e-7, 1.0)
        logpt_t = jnp.take_along_axis(logpt, target[..., None], -1)[..., 0]
        pt_t = jnp.take_along_axis(pt, target[..., None], -1)[..., 0]
        if alpha is not None:
            if isinstance(alpha, (list, tuple)):
                a = jnp.asarray(alpha, jnp.float32)
            else:
                a = jnp.ones(logits.shape[-1], jnp.float32)
                a = a.at[1:].set(float(alpha))
            logpt_t = logpt_t * a[target]
        loss = -((1.0 - pt_t) ** gamma) * logpt_t
        if ignore_index is not None:
            m = (target != ignore_index).astype(loss.dtype)
            loss = loss * m
            if reduction == "mean":
                return jnp.sum(loss) / jnp.maximum(jnp.sum(m), 1.0)
            return jnp.sum(loss)
        if reduction == "mean":
            return jnp.mean(loss)
        if reduction == "sum":
            return jnp.sum(loss)
        return loss

    def loss_fn(output: dict, target: dict, prefix: str = ""):
        dynamic = branch_loss(
            output[f"dynamic_seg{prefix}"], target["dynamic_seg_label"]
        )
        static = branch_loss(
            output[f"static_seg{prefix}"], target["static_seg_label"]
        )
        total = dynamic + static
        return total, {
            f"total_loss{prefix}": total,
            f"dynamic_loss{prefix}": dynamic,
            f"static_loss{prefix}": static,
        }

    return loss_fn
