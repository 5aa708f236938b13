"""Airv2x BM2CP: multimodal (LiDAR+camera) per-agent encoding with
confidence-guided collaboration.

Capability twin of models/airv2x_bm2cp.py + bm2cp_modules/: each agent
encodes both modalities (hetero encoder with lidar+cam and mean BEV
fusion); a learned per-agent modality-confidence map (``thres_map`` — the
reference derives it from the lidar/camera interaction blocks in
sensor_blocks.py, simplified here to a conv head over the fused BEV)
modulates a where2comm-style confidence-masked attention fusion
(bm2cp_modules/attentioncomm). The detailed lidar-guided-depth interaction
of sensor_blocks.py is a noted simplification to tighten later.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from airv2x_tpu.models.fusion.common import ego_agent_attention
from airv2x_tpu.models.fusion.where2comm import Communication
from airv2x_tpu.models.intermediate_models import PostBackboneFusionModel
from airv2x_tpu.models.registry import register_model


@register_model("airv2x_bm2cp")
class Airv2xBM2CP(PostBackboneFusionModel):
    def setup_fusion(self):
        fcfg = self.args.get("bm2cp_fusion", {})
        comm = fcfg.get("communication", {})
        gauss = comm.get("gaussian_smooth")
        self.communication = Communication(
            threshold=comm.get("threshold", 0.01),
            smooth=gauss is not None,
            k_size=gauss["k_size"] if gauss else 5,
            c_sigma=gauss["c_sigma"] if gauss else 1.0,
        )
        self.thres_head = nn.Conv(1, (1, 1), dtype=self.dtype, name="thres_head")

    def fuse(self, grouped, batch, train):
        b, l = grouped.shape[:2]
        flat = grouped.reshape((b * l,) + grouped.shape[2:])
        # modality-confidence map per agent (thres_map stand-in)
        thres = self.thres_head(flat).reshape((b, l) + grouped.shape[2:4] + (1,))
        comm_mask, rate = self.communication(
            thres, batch["agent_mask"], train=train
        )
        gated = grouped * comm_mask[..., None] * jax.nn.sigmoid(thres)
        fused = ego_agent_attention(gated, batch["agent_mask"])
        return fused, rate
