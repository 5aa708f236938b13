"""LSS depth-supervision loss (twin of loss/point_pillar_depth_loss.py).

Adds a depth-classification term on the camera branch's depth-bin logits
against binned ground-truth depth, on top of the base detection loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from airv2x_tpu.loss.point_pillar_multiclass import make_multiclass_loss
from airv2x_tpu.loss.registry import register_loss


@register_loss("point_pillar_depth_loss")
def make_depth_loss(args: dict):
    base = make_multiclass_loss(args)
    depth_weight = float(args.get("depth_weight", 1.0))

    def loss_fn(output: dict, target: dict, prefix: str = ""):
        total, parts = base(output, target, prefix)
        if "depth_logits" in output and output["depth_logits"] is not None and (
            "depth_labels" in target
        ):
            logits = output["depth_logits"].astype(jnp.float32)
            labels = target["depth_labels"].astype(jnp.int32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
            dloss = jnp.mean(nll)
            total = total + depth_weight * dloss
            parts = dict(parts)
            parts["depth_loss"] = dloss
            parts[f"total_loss{prefix}"] = total
        return total, parts

    return loss_fn
