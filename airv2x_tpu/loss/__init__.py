from airv2x_tpu.loss.registry import LOSS_REGISTRY, build_loss, register_loss

from airv2x_tpu.loss import point_pillar_multiclass  # noqa: F401
from airv2x_tpu.loss import seg_loss  # noqa: F401
from airv2x_tpu.loss import variants  # noqa: F401
from airv2x_tpu.loss import point_pillar_binary  # noqa: F401
from airv2x_tpu.loss import depth_loss  # noqa: F401

__all__ = ["LOSS_REGISTRY", "build_loss", "register_loss"]
