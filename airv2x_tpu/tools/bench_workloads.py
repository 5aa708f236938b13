"""On-chip scenes/s for the non-flagship workloads: camera-LSS det + BEV seg.

VERDICT r4 missing #1 / item 4: the reference runs camera and segmentation
as first-class workloads (opencood/tools/inference_airv2x_seg.py:103-240,
hypes_yaml/airv2x/camera/), but every committed chip number was
LiDAR-det-only. This benchmarks, with bench.py's exact scan methodology
(K scenes inside ONE jitted program, scalar fetch, fresh buffers):

  camera_det : hypes_yaml/airv2x/camera/det/where2comm.yaml — 3 veh x 6 cams
               + 2 rsu x 4 cams + 1 drone x 1 cam at the reference's
               256x352 post-aug size (airv2x_utils.py:38-98 camera lists),
               EfficientNet trunk -> LSS splat -> where2comm fuse ->
               decode + rotated NMS.
  lidar_seg  : hypes_yaml/airv2x/lidar/seg/where2comm.yaml — pillar encode
               -> fuse -> BevSegHead dynamic+static argmax (the
               postprocess of inference_airv2x_seg).
  temporal_det : hypes_yaml/opv2v/opv2v_scope.yaml — SCOPE at OPV2V scale
               (5 cavs, T=2 frames, per-frame encode+backbone, LSTM
               temporal fusion, confidence-masked collaboration, late
               blending) -> decode + rotated NMS.

Camera scenes carry ~91 MB of images each, so the scan axis defaults to 16
steps (1.5 GB resident) instead of the lidar bench's 64; temporal scenes
carry T x 5 x 20k points and default to 32.

  python -m airv2x_tpu.tools.bench_workloads
      [--workloads camera_det,lidar_seg,temporal_det] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

NUM_AGENTS = {"vehicle": 3, "rsu": 2, "drone": 1}
NCAM = {"vehicle": 6, "rsu": 4, "drone": 1}  # reference camera rigs
POINTS_PER_AGENT = 20000
N_SCENES = 8


def build_workload(name: str, scan_len: int):
    import jax
    import jax.numpy as jnp

    from airv2x_tpu.config import load_yaml
    from airv2x_tpu.data.postprocess import decode_detections
    from airv2x_tpu.data.synthetic import add_camera_inputs, make_scene
    from airv2x_tpu.models import build_model
    from airv2x_tpu.models.base import SlotLayout
    from airv2x_tpu.ops.anchors import generate_anchor_grid
    from airv2x_tpu.utils.compile_opts import model_compiler_options

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cfg = {
        "camera_det": "hypes_yaml/airv2x/camera/det/where2comm.yaml",
        "lidar_seg": "hypes_yaml/airv2x/lidar/seg/where2comm.yaml",
        "temporal_det": "hypes_yaml/opv2v/opv2v_scope.yaml",
    }[name]
    hypes = load_yaml(os.path.join(repo, cfg))
    hypes["model"]["args"]["dtype"] = os.environ.get("BENCH_DTYPE", "bf16")
    if name == "temporal_det":
        num_agents = {"vehicle": int(hypes["model"]["args"]["max_cav"])}
    else:
        num_agents = dict(NUM_AGENTS)
        hypes["model"]["args"]["max_cav"] = dict(NUM_AGENTS)
        hypes["train_params"]["max_cav"] = dict(NUM_AGENTS)
    model = build_model(hypes)
    layout = SlotLayout.from_args(hypes["model"]["args"])

    rng = np.random.default_rng(0)
    scenes = []
    for _ in range(N_SCENES):
        b, _ = make_scene(
            rng,
            layout,
            num_objects=12,
            num_agents=num_agents,
            points_per_agent=POINTS_PER_AGENT,
            lidar_range=hypes["preprocess"]["cav_lidar_range"],
            pts_per_box=100,
        )
        if name == "camera_det":
            margs = hypes["model"]["args"]
            hw = tuple(margs["vehicle"]["cam"]["data_aug_conf"]["final_dim"])
            add_camera_inputs(b, layout, rng, img_hw=hw, ncam=NCAM)
        if name == "temporal_det":
            # SCOPE temporal contract (scope_model.py __call__): stack T
            # frames on axis 0 of each per-scene array + identity history
            t = int(hypes["model"]["args"]["fusion_args"].get("frame", 2))
            for k in ("points", "points_mask", "agent_mask",
                      "pairwise_t_full"):
                b[k] = np.stack([b[k]] * t, axis=0)
            b["history_t"] = np.broadcast_to(
                np.eye(4, dtype=np.float32), (t, 4, 4)
            ).copy()
        scenes.append(b)

    reps = max(1, scan_len // N_SCENES)
    xs = {}
    for k in scenes[0]:
        if isinstance(scenes[0][k], dict):
            xs[k] = {
                kk: jnp.asarray(np.tile(
                    np.stack([s[k][kk] for s in scenes])[:, None],
                    (reps,) + (1,) * (scenes[0][k][kk].ndim + 1),
                ))
                for kk in scenes[0][k]
            }
        else:
            a = np.stack([s[k] for s in scenes])[:, None]
            xs[k] = jnp.asarray(np.tile(a, (reps,) + (1,) * (a.ndim - 1)))

    variables = jax.jit(
        lambda rngs, b: model.init(rngs, b, train=False)
    )({"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)},
      jax.tree.map(lambda x: x[0], xs))

    copts = model_compiler_options(hypes) or {}
    if name in ("camera_det", "temporal_det"):
        anchors = jnp.asarray(
            generate_anchor_grid(hypes["postprocess"]["anchor_args"])
        )
        lidar_range = jnp.asarray(
            hypes["preprocess"]["cav_lidar_range"], jnp.float32
        )
        tgt = hypes["postprocess"].get("target_args", {})
        num_class = int(hypes.get("num_class", 1))
        obj_thr = float(tgt.get("obj_threshold", 0.2))
        eye = jnp.eye(4)

        def body(variables, batch):
            out = model.apply(variables, batch, train=False)
            psm, rm = out["psm"][0], out["rm"][0]
            if "obj" in out:
                obj = out["obj"][0]
            else:  # single-class OPV2V heads carry no obj branch
                obj = jnp.ones(
                    psm.shape[:2] + (psm.shape[-1] // num_class,), psm.dtype
                )
            det = decode_detections(
                psm, rm, obj,
                anchors, eye, lidar_range,
                num_class=num_class,
                obj_threshold=obj_thr,
                nms_thresh=hypes["postprocess"]["nms_thresh"],
                top_k=int(os.environ.get("BENCH_TOPK", "512")),
            )
            return jnp.sum(det.mask) + jnp.sum(det.scores) * 1e-6
    else:
        def body(variables, batch):
            out = model.apply(variables, batch, train=False)
            # inference_airv2x_seg postprocess: per-branch argmax
            dyn = jnp.argmax(out["dynamic_seg"], axis=-1)
            sta = jnp.argmax(out["static_seg"], axis=-1)
            return (jnp.sum(dyn) + jnp.sum(sta)).astype(jnp.float32)

    @jax.jit
    def run_all(variables, xs):
        def step(acc, batch):
            return acc + body(variables, batch), ()

        acc, _ = jax.lax.scan(step, jnp.float32(0), xs)
        return acc

    if copts:
        run_all = jax.jit(run_all, compiler_options=copts)
    return variables, xs, run_all


def measure(name: str, scan_len: int, repeats: int = 3):
    import jax

    variables, xs, run_all = build_workload(name, scan_len)
    t0 = time.perf_counter()
    # run_all is already jitted (with per-config compiler options when the
    # config needs them — re-wrapping would nest jits and reject options)
    compiled = run_all.lower(variables, xs).compile()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(compiled(variables, xs))
    first_s = time.perf_counter() - t0
    steps = scan_len

    best = float("inf")
    for _ in range(repeats):
        fresh = jax.tree.map(lambda a: a.copy(), xs)
        jax.block_until_ready(fresh)
        t0 = time.perf_counter()
        float(run_all(variables, fresh))
        best = min(best, time.perf_counter() - t0)
    return {
        "scenes_per_sec": round(steps / best, 2),
        "ms_per_scene": round(best / steps * 1e3, 2),
        "compile_s": round(compile_s, 1),
        "first_run_s": round(first_s, 2),
        "scan_len": steps,
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument(
        "--workloads", default="camera_det,lidar_seg,temporal_det"
    )
    p.add_argument("--camera_scan", type=int, default=16)
    p.add_argument("--seg_scan", type=int, default=64)
    p.add_argument("--temporal_scan", type=int, default=32)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--json", default=None)
    opt = p.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    results = {}
    for name in opt.workloads.split(","):
        scan = {"camera_det": opt.camera_scan,
                "temporal_det": opt.temporal_scan}.get(name, opt.seg_scan)
        results[name] = measure(name, scan, opt.repeats)
        print(f"# {name}: {results[name]}", file=sys.stderr)
    line = json.dumps(results)
    print(line)
    if opt.json:
        with open(opt.json, "w") as f:
            f.write(line)


if __name__ == "__main__":
    main()
