"""Every shipped experiment YAML builds: load -> build_model -> build_loss ->
abstract forward trace (jax.eval_shape: full-scale shapes, zero FLOPs).

This is the smoke net over hypes_yaml/{airv2x,opv2v,dair-v2x,V2X-R}/ the
reference lacks — a config typo, a missing model arg, or a shape
inconsistency in any shipped experiment fails here without needing minutes
of CPU compute per config.
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airv2x_tpu.config import load_yaml
from airv2x_tpu.data.synthetic import make_batch
from airv2x_tpu.loss import build_loss
from airv2x_tpu.models import build_model
from airv2x_tpu.models.base import SlotLayout

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALL_YAMLS = sorted(
    os.path.relpath(p, os.path.join(REPO, "hypes_yaml"))
    for p in glob.glob(os.path.join(REPO, "hypes_yaml", "**", "*.yaml"),
                       recursive=True)
    if not p.endswith("tiny_where2comm.yaml")  # exercised by other suites
)


def _build_batch(hypes, layout):
    """Small-point-count batch with every key the config's model family
    consumes; shapes only matter for tracing."""
    rng = np.random.default_rng(0)
    core = hypes["model"]["core_method"].lower()
    needs_radar = (
        any(k in core for k in ("l4dr", "lrf", "interf", "mdd", "rtnh"))
        or "processed_radar" in str(hypes["model"]["args"])
    )
    batch, _ = make_batch(
        rng,
        layout,
        batch_size=1,
        num_objects=2,
        points_per_agent=128,
        lidar_range=hypes["preprocess"]["cav_lidar_range"],
        max_boxes=hypes["postprocess"]["max_num"],
        pts_per_box=16,
        radar_points_per_agent=32 if needs_radar else 0,
    )

    margs = hypes["model"]["args"]
    cam_types = [
        t for t in ("vehicle", "rsu", "drone")
        if isinstance(margs.get(t), dict)
        and "cam" in margs[t].get("modalities", [])
    ]
    if cam_types:
        from airv2x_tpu.data.synthetic import add_camera_inputs

        hw = tuple(margs[cam_types[0]]["cam"]["data_aug_conf"]["final_dim"])
        one = {"points": batch["points"][0]}
        add_camera_inputs(one, layout, rng, img_hw=hw)
        for key, v in one.items():
            if key.startswith("cam_"):
                batch[key] = {kk: vv[None] for kk, vv in v.items()}

    if core == "airv2x_bm2cp":  # faithful BM2CP: per-type cam + depth maps
        from airv2x_tpu.data.synthetic import bm2cp_airv2x_batch

        for key, v in bm2cp_airv2x_batch(hypes, rng).items():
            if key.startswith("cam_"):
                batch[key] = v
        return batch

    if core == "point_pillar_bm2cp":  # flat multimodal: per-slot camera
        img = margs["img_params"]
        h, w = img["data_aug_conf"]["final_dim"]
        L = layout.total
        batch["cam_vehicle"] = {
            "imgs": rng.uniform(0, 1, (1, L, 1, h, w, 3)).astype(np.float32),
            "depth_maps": rng.integers(
                0, img["grid_conf"]["ddiscr"][2], (1, L, 1, h, w)
            ).astype(np.float32),
            "intrinsics": np.broadcast_to(
                np.eye(3, dtype=np.float32) * 50, (1, L, 1, 3, 3)
            ).copy(),
            "rots": np.broadcast_to(
                np.eye(3, dtype=np.float32), (1, L, 1, 3, 3)
            ).copy(),
            "trans": np.zeros((1, L, 1, 3), np.float32),
            "post_rots": np.broadcast_to(
                np.eye(3, dtype=np.float32), (1, L, 1, 3, 3)
            ).copy(),
            "post_trans": np.zeros((1, L, 1, 3), np.float32),
        }

    if any(k in core for k in ("scope", "how2comm")):  # K-frame stacks
        t_frames = 2
        frame_keys = ["points", "points_mask", "agent_mask", "pairwise_t_full"]
        if needs_radar:
            frame_keys += ["radar_points", "radar_points_mask"]
        for key in frame_keys:
            batch[key] = np.stack([batch[key][0]] * t_frames)[None]
        batch["history_t"] = np.broadcast_to(
            np.eye(4, dtype=np.float32), (1, t_frames, 4, 4)
        ).copy()
    return batch


@pytest.mark.parametrize("rel", ALL_YAMLS)
def test_config_builds(rel):
    hypes = load_yaml(os.path.join(REPO, "hypes_yaml", rel))
    model = build_model(hypes)
    build_loss(hypes)

    layout = SlotLayout.from_args(hypes["model"]["args"])
    assert layout.total >= 1, "config resolves to zero agent slots"

    batch = jax.tree.map(jnp.asarray, _build_batch(hypes, layout))
    rngs = {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)}
    # abstract trace: catches missing args, bad wiring, shape mismatches
    shapes = jax.eval_shape(lambda: model.init(rngs, batch, train=False))
    assert "params" in shapes

    out = jax.eval_shape(
        lambda: model.apply(
            jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes
            ),
            batch,
            train=False,
        )
    )
    task = hypes["model"]["args"].get("task", "det")
    if task == "det":
        assert "psm" in out and "rm" in out
    else:
        assert "dynamic_seg" in out or "static_seg" in out
