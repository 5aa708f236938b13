"""Loss variants: SiCP dual supervision and STAMP adapter alignment.

Twins of loss/point_pillar_loss_sicp[_multiclass].py (single + cooperative
heads both supervised) and loss/adapter_loss.py:12-48 (feature-space
alignment between adapted/reverted maps and the protocol features).
"""

from __future__ import annotations

import jax.numpy as jnp

from airv2x_tpu.loss.point_pillar_multiclass import make_multiclass_loss
from airv2x_tpu.loss.registry import register_loss


@register_loss("point_pillar_loss_sicp_multiclass", "point_pillar_loss_sicp")
def make_sicp_loss(args: dict):
    # the flat OPV2V/V2X-R family uses the binary loss on both branches
    # (loss/point_pillar_loss_sicp.py); AirV2X configs carry num_class and
    # get the multiclass twin (loss/point_pillar_loss_sicp_multiclass.py)
    if "num_class" in args:
        base = make_multiclass_loss(args)
    else:
        from airv2x_tpu.loss.point_pillar_binary import make_binary_loss

        base = make_binary_loss(args)

    def loss_fn(output: dict, target: dict, prefix: str = ""):
        if "psm1" in output:
            t1, p1 = base(output, target, prefix="1")
            t2, p2 = base(output, target, prefix="2")
            total = t1 + t2
            parts = {"total_loss": total}
            parts.update(p1)
            parts.update(p2)
            return total, parts
        return base(output, target, prefix)

    return loss_fn


@register_loss("adapter_loss")
def make_adapter_loss(args: dict):
    """STAMP stage-2 adapter alignment: L1 between translated feature maps.

    Terms (adapter_loss.py:12-48): FM (adapter(ego) vs protocol), P2M
    (reverter(protocol) vs ego), FP2M (reverter(adapter(ego)) vs ego),
    weighted by the config coefficients.
    """
    w_fm = float(args.get("fm", 1.0))
    w_p2m = float(args.get("p2m", 1.0))
    w_fp2m = float(args.get("fp2m", 1.0))

    def loss_fn(output: dict, target: dict, prefix: str = ""):
        def l1(a, b):
            return jnp.mean(jnp.abs(a - b))

        total = jnp.asarray(0.0)
        parts = {}
        if "adapted" in output and "protocol" in output:
            fm = l1(output["adapted"], output["protocol"])
            total = total + w_fm * fm
            parts["fm_loss"] = fm
        if "reverted" in output and "ego_feature" in output:
            p2m = l1(output["reverted"], output["ego_feature"])
            total = total + w_p2m * p2m
            parts["p2m_loss"] = p2m
        if "cycled" in output and "ego_feature" in output:
            fp2m = l1(output["cycled"], output["ego_feature"])
            total = total + w_fp2m * fp2m
            parts["fp2m_loss"] = fp2m
        parts["total_loss"] = total
        return total, parts

    return loss_fn
