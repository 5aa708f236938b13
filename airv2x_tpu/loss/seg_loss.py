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
