"""Heterogeneous multi-agent base: slot layout + per-type LiDAR encoders.

TPU re-design of the reference Airv2xBase
(models/common_modules/airv2x_base_model.py): instead of ragged per-type
tensors regrouped with ``batch_idxs`` / ``record_len`` / ``tensor_split``
(:179-291), every sample carries a *statically laid-out* dense agent axis:

    slot 0 .. V-1   : vehicles (ego is always slot 0)
    slot V .. V+R-1 : road-side units
    slot V+R .. L-1 : drones

with a boolean ``agent_mask`` for absent agents. Each agent type has its own
encoder parameters and z-extent (the veh/rsu/drone grids share (nx, ny) but
differ in z, mirroring the per-type lidar ranges in the config), and the
whole encode — voxelize -> PillarVFE -> BEV scatter — is one jitted program.

Batch dict contract (produced by airv2x_tpu.data):
    points        (B, L, N, 4) float32  — ego-frame if proj_first
    points_mask   (B, L, N)   bool
    agent_mask    (B, L)      bool
    pairwise_t    (B, L, 4, 4) float32  — cav->ego (identity when proj_first)
    prior_encoding(B, L, 3)   float32   — velocity, time delay, infra flag
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from airv2x_tpu.models.pillar_vfe import PillarVFE
from airv2x_tpu.ops.scatter import scatter_pillars_to_bev_batch
from airv2x_tpu.ops.voxelize import pillarize_batch

AGENT_TYPES = ("vehicle", "rsu", "drone")


@dataclasses.dataclass(frozen=True)
class SlotLayout:
    """Static agent-slot layout derived from the config's max_cav."""

    counts: tuple  # (n_vehicle, n_rsu, n_drone); zero for absent types

    @classmethod
    def from_args(cls, args: dict) -> "SlotLayout":
        max_cav = args["max_cav"]
        from collections.abc import Mapping

        if not isinstance(max_cav, Mapping):  # OPV2V scalar: all vehicles
            return cls(counts=(int(max_cav), 0, 0))
        collab = args.get("collaborators", list(AGENT_TYPES))
        counts = tuple(
            int(max_cav.get(t, 0)) if t in collab else 0 for t in AGENT_TYPES
        )
        return cls(counts=counts)

    @property
    def total(self) -> int:
        return sum(self.counts)

    def slots(self, agent_type: str) -> slice:
        i = AGENT_TYPES.index(agent_type)
        start = sum(self.counts[:i])
        return slice(start, start + self.counts[i])


class HeteroLidarEncoder(nn.Module):
    """Shared pillarization + per-type PillarVFE -> dense (B, L, ny, nx, C).

    Faithful to the reference data flow under ``proj_first``: every agent's
    (ego-frame) cloud is voxelized by the *ego* preprocessor settings
    (intermediate_fusion_dataset.py:598-608 feeds the shared
    SpVoxelPreprocessor), while each agent type's PillarVFE uses its own
    voxel_size / lidar_range constants for the center-offset features
    (airv2x_base_model.py:49-55). The scatter grid is the shared ego grid.
    """

    args: dict
    preprocess: dict
    layout: SlotLayout
    max_pillars: int
    max_points_per_pillar: int
    # True -> return (x, {"lidar": ..., "cam": ...}) with per-modality BEV
    # maps (zeros where a type lacks the modality) so callers like BM2CP can
    # run their own modal interaction instead of the default mean.
    keep_modal: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch, train: bool = False):
        pre = self.preprocess
        lidar_range = pre["cav_lidar_range"]
        voxel_size = pre["args"]["voxel_size"]
        grid = tuple(
            int(round((lidar_range[3 + i] - lidar_range[i]) / voxel_size[i]))
            for i in range(3)
        )
        nx, ny = grid[0], grid[1]

        pts = batch["points"]  # (B, L, N, 4)
        b, l = pts.shape[:2]

        any_lidar = any(
            "lidar" in self.args[t].get("modalities", [])
            for t in AGENT_TYPES
            if self.layout.counts[AGENT_TYPES.index(t)]
        )
        # sort-free encoder (ops/fast_pillars.py) for single-PFN-layer
        # configs: ~4 ms vs ~21 ms at 120k pts. Opt out with
        # preprocess.args.fast_pillars: false.
        fast = bool(pre["args"].get("fast_pillars", True)) and all(
            len(self.args[t]["lidar"]["pillar_vfe"]["num_filters"]) == 1
            for t in AGENT_TYPES
            if self.layout.counts[AGENT_TYPES.index(t)]
            and "lidar" in self.args[t].get("modalities", [])
        )
        if any_lidar and not fast:
            flat_pts = pts.reshape((b * l,) + pts.shape[2:])
            flat_mask = batch["points_mask"].reshape((b * l,) + pts.shape[2:3])
            pil = pillarize_batch(
                flat_pts,
                flat_mask,
                lidar_range=jnp.asarray(lidar_range, jnp.float32),
                voxel_size=jnp.asarray(voxel_size, jnp.float32),
                grid_size=grid,
                max_pillars=self.max_pillars,
                max_points_per_pillar=self.max_points_per_pillar,
            )
            voxels = pil.voxels.reshape((b, l) + pil.voxels.shape[1:])
            npts = pil.num_points.reshape((b, l) + pil.num_points.shape[1:])
            coords = pil.coords.reshape((b, l) + pil.coords.shape[1:])
            pmask = pil.mask.reshape((b, l) + pil.mask.shape[1:])

        feats = []
        modal_feats = {"lidar": [], "cam": []}
        for t in AGENT_TYPES:
            sl = self.layout.slots(t)
            n_t = sl.stop - sl.start
            if n_t == 0:
                continue
            modalities = self.args[t].get("modalities", ["lidar"])

            def slice_flat(a, sl=sl, n_t=n_t):
                s = a[:, sl]
                return s.reshape((b * n_t,) + s.shape[2:])

            modal_bevs = []
            if "lidar" in modalities:
                cfg = self.args[t]["lidar"]
                if fast:
                    from airv2x_tpu.ops.fast_pillars import FastPillarBEV

                    bev = FastPillarBEV(
                        num_filters=cfg["pillar_vfe"]["num_filters"],
                        voxel_size=voxel_size,
                        lidar_range=lidar_range,
                        use_norm=cfg["pillar_vfe"]["use_norm"],
                        with_distance=cfg["pillar_vfe"]["with_distance"],
                        use_absolute_xyz=cfg["pillar_vfe"]["use_absolute_xyz"],
                        offset_voxel_size=cfg["voxel_size"],
                        offset_lidar_range=cfg["lidar_range"],
                        dtype=self.dtype,
                        name=f"{t}_pillar_vfe",
                    )(
                        slice_flat(pts),
                        slice_flat(batch["points_mask"]),
                        train,
                    )  # (B*n_t, ny, nx, C)
                else:
                    vfe = PillarVFE(
                        num_filters=cfg["pillar_vfe"]["num_filters"],
                        voxel_size=cfg["voxel_size"],
                        lidar_range=cfg["lidar_range"],
                        use_norm=cfg["pillar_vfe"]["use_norm"],
                        with_distance=cfg["pillar_vfe"]["with_distance"],
                        use_absolute_xyz=cfg["pillar_vfe"]["use_absolute_xyz"],
                        dtype=self.dtype,
                        name=f"{t}_pillar_vfe",
                    )
                    # PillarVFE is pointwise over pillars, so the (B*n_t)
                    # agent axis rides along as a leading batch dim.
                    pf = vfe(
                        slice_flat(voxels),
                        slice_flat(npts),
                        slice_flat(coords),
                        slice_flat(pmask),
                        train,
                    )
                    bev = scatter_pillars_to_bev_batch(
                        pf, slice_flat(coords), slice_flat(pmask), ny=ny, nx=nx
                    )  # (B*n_t, ny, nx, C)
                modal_bevs.append(bev)

            if "cam" in modalities:
                from airv2x_tpu.models.camera.lss import LSSCameraEncoder

                cam_key = f"cam_{t}"
                assert cam_key in batch, (
                    f"config requests cam modality for {t} but batch has no "
                    f"'{cam_key}' inputs"
                )
                cam_inputs = {
                    k: slice_flat(v) for k, v in batch[cam_key].items()
                }
                cam_bev = LSSCameraEncoder(
                    cfg=self.args[t]["cam"],
                    dtype=self.dtype,
                    name=f"{t}_lss",
                )(cam_inputs, train)
                modal_bevs.append(cam_bev)

            # mean over modalities (airv2x_base_model.fuse_bev :167-177)
            bev = (
                modal_bevs[0]
                if len(modal_bevs) == 1
                else jnp.mean(jnp.stack(modal_bevs, 0), axis=0)
            )
            # Opt-in scheduling fence between the per-type encoder branches:
            # the B>=4 training cliff is an XLA scheduling artifact of the
            # combined hetero-encoder graph (doc/performance.md round 3/4);
            # a barrier stops XLA from interleaving the three type subgraphs
            # into one mega-schedule. AIRV2X_ENC_BARRIER is a comma set,
            # e.g. "type" or "type,scatter" (see ops/fast_pillars.py).
            # Read at TRACE time: changing it after a jitted graph is
            # cached in-process has no effect on that graph (ADVICE r4).
            import os

            if "type" in os.environ.get(
                "AIRV2X_ENC_BARRIER", ""
            ).split(","):
                import jax

                bev = jax.lax.optimization_barrier(bev)
            feats.append(bev.reshape((b, n_t) + bev.shape[1:]))
            if self.keep_modal:
                for mod_name in ("lidar", "cam"):
                    got = dict(zip(modalities, modal_bevs)).get(mod_name)
                    if got is None:
                        got = jnp.zeros_like(modal_bevs[0])
                    modal_feats[mod_name].append(
                        got.reshape((b, n_t) + got.shape[1:])
                    )

        x = jnp.concatenate(feats, axis=1)  # (B, L, ny, nx, C)
        # zero padding agents' features
        am = batch["agent_mask"][:, :, None, None, None].astype(x.dtype)
        x = x * am
        if self.keep_modal:
            modal = {
                k: jnp.concatenate(v, axis=1) * am
                for k, v in modal_feats.items()
            }
            return x, modal
        return x
