"""Model zoo: flax modules, NHWC layout, shape-static, jit/pjit friendly.

``build_model(hypes)`` resolves the config's ``model.core_method`` through an
explicit registry (the reference uses importlib + case-insensitive class-name
matching, tools/train_utils.py:288-325 — here names are exact keys).
"""

from airv2x_tpu.models.registry import MODEL_REGISTRY, build_model, register_model

# Import model modules for registration side effects.
from airv2x_tpu.models import where2comm_model  # noqa: F401
from airv2x_tpu.models import intermediate_models  # noqa: F401
from airv2x_tpu.models import v2xvit_model  # noqa: F401
from airv2x_tpu.models import heal_model  # noqa: F401
from airv2x_tpu.models import stamp_model  # noqa: F401
from airv2x_tpu.models import point_pillar_models  # noqa: F401
from airv2x_tpu.models import scope_model  # noqa: F401
from airv2x_tpu.models import how2comm_model  # noqa: F401
from airv2x_tpu.models import where2comm_attn_model  # noqa: F401
from airv2x_tpu.models import point_pillar_bm2cp_model  # noqa: F401
from airv2x_tpu.models import radar_models  # noqa: F401
from airv2x_tpu.models import bm2cp_model  # noqa: F401
from airv2x_tpu.models import coalign_model  # noqa: F401
from airv2x_tpu.models import lss_model  # noqa: F401
from airv2x_tpu.models import early_fusion_model  # noqa: F401
from airv2x_tpu.models import att_backbone_models  # noqa: F401

__all__ = ["MODEL_REGISTRY", "build_model", "register_model"]
