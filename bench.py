"""End-to-end throughput benchmark: scenes/sec/chip (voxelize->fuse->detect).

Runs the flagship full-scale Where2comm model (704x200 BEV grid, 6 active
agents, 20k points each) end to end ON DEVICE: pillarization, hetero
encoding, backbone, confidence-gated fusion, heads, box decode and rotated
NMS — the pipeline the reference spreads across spconv/C++ dataloader
workers, the GPU model, and shapely CPU postprocessing.

Methodology (see .claude/skills/verify/SKILL.md): the axon tunnel's
completion signals are unreliable and host round-trips cost ~4 ms, so the
benchmark folds the scenes into ONE jitted lax.scan program and fetches a
scalar; wall time / scan length is honest device throughput. One jitted
invocation additionally pays a ~28 ms fixed dispatch cost through the
tunnel (measured with a no-op scan: constant in the scan length), so the
8 distinct scenes are tiled along the scan axis to SCAN_LEN=64 steps —
sustained-stream throughput with the launch overhead amortized, the way
the pipeline runs in serving. Values cannot be result-cached across scan
steps (scan reads are dynamic slices) and fresh input buffers are used
per repeat (identical buffers hit a whole-program result cache).

Prints one JSON line:
  {"metric": ..., "value": scenes/sec, "unit": "scenes/s", "vs_baseline": x}
``vs_baseline`` is the speedup over the same program on the host CPU
(the reference's voxelize+NMS run on CPU; target >= 10x per BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

N_SCENES = 8
SCAN_LEN = int(os.environ.get("BENCH_SCAN_LEN", "64"))
POINTS_PER_AGENT = 20000
NUM_AGENTS = {"vehicle": 3, "rsu": 2, "drone": 1}


def _enable_compile_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def build_model_and_inputs(n_scenes: int, scan_len: int | None = None):
    """Flagship model + scan-stacked synthetic inputs (shared with
    airv2x_tpu/tools/profile_stages.py)."""
    import jax
    import jax.numpy as jnp

    from airv2x_tpu.config import load_yaml
    from airv2x_tpu.data.synthetic import make_scene
    from airv2x_tpu.models import build_model
    from airv2x_tpu.models.base import SlotLayout
    from airv2x_tpu.ops.anchors import generate_anchor_grid

    scan_len = SCAN_LEN if scan_len is None else scan_len
    repo = os.path.dirname(os.path.abspath(__file__))
    hypes = load_yaml(os.path.join(repo, "hypes_yaml/airv2x/lidar/det/where2comm.yaml"))
    hypes["model"]["args"]["dtype"] = os.environ.get("BENCH_DTYPE", "bf16")
    # Size the static agent capacity to the benchmarked scene (3 veh + 2 rsu
    # + 1 drone): the reference's compute scales with the ACTUAL agent count
    # (ragged record_len), ours with the configured capacity — equal-work
    # comparison requires equal capacity.
    hypes["model"]["args"]["max_cav"] = dict(NUM_AGENTS)
    hypes["train_params"]["max_cav"] = dict(NUM_AGENTS)
    model = build_model(hypes)
    layout = SlotLayout.from_args(hypes["model"]["args"])
    anchors = jnp.asarray(generate_anchor_grid(hypes["postprocess"]["anchor_args"]))

    rng = np.random.default_rng(0)
    scenes = []
    for _ in range(n_scenes):
        b, _ = make_scene(
            rng,
            layout,
            num_objects=12,
            num_agents=NUM_AGENTS,
            points_per_agent=POINTS_PER_AGENT,
            lidar_range=hypes["preprocess"]["cav_lidar_range"],
            pts_per_box=100,
        )
        scenes.append(b)
    # stack scenes on a leading scan axis, each with batch dim 1
    # tile the distinct scenes along the scan axis to scan_len sustained
    # steps (launch-overhead amortization; see module docstring)
    reps = max(1, scan_len // n_scenes)
    if reps * n_scenes != scan_len:
        print(
            f"# scan_len={scan_len} not a multiple of {n_scenes} "
            f"scenes; effective scan length {reps * n_scenes}",
            file=sys.stderr,
        )
    xs = {}
    for k in scenes[0]:
        a = np.stack([s[k] for s in scenes])[:, None]
        xs[k] = jnp.asarray(np.tile(a, (reps,) + (1,) * (a.ndim - 1)))

    # jitted init: unjitted tracing dispatches thousands of ops through the
    # device tunnel (~4 ms each) — minutes of pure latency at full scale.
    variables = jax.jit(
        lambda rngs, b: model.init(rngs, b, train=False)
    )({"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)},
      jax.tree.map(lambda x: x[0], xs))
    return model, hypes, anchors, variables, xs


def build_bench(n_scenes: int):
    import jax
    import jax.numpy as jnp

    from airv2x_tpu.data.postprocess import decode_detections

    model, hypes, anchors, variables, xs = build_model_and_inputs(n_scenes)

    lidar_range = jnp.asarray(hypes["preprocess"]["cav_lidar_range"], jnp.float32)
    tgt = hypes["postprocess"]["target_args"]
    eye = jnp.eye(4)

    @jax.jit
    def run_all(variables, xs):
        def body(acc, batch):
            out = model.apply(variables, batch, train=False)
            det = decode_detections(
                out["psm"][0],
                out["rm"][0],
                out["obj"][0],
                anchors,
                eye,
                lidar_range,
                num_class=hypes["num_class"],
                obj_threshold=tgt["obj_threshold"],
                nms_thresh=hypes["postprocess"]["nms_thresh"],
                top_k=int(os.environ.get("BENCH_TOPK", "512")),
            )
            return acc + jnp.sum(det.mask) + jnp.sum(det.scores) * 1e-6, ()

        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    return variables, xs, run_all


def measure(n_scenes: int, repeats: int = 3) -> float:
    _enable_compile_cache()
    t0 = time.perf_counter()
    variables, xs, run_all = build_bench(n_scenes)
    print(f"# build+init {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    import jax

    # Separate compile from first run (round-3 recorded a 457.8 s combined
    # number with no way to tell program growth from tunnel degradation —
    # VERDICT r3 item 4). AOT-compile first, then time the first execution.
    t0 = time.perf_counter()
    compiled = jax.jit(run_all).lower(variables, xs).compile()
    print(f"# compile {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    float(compiled(variables, xs))
    print(f"# first-run {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    best = float("inf")
    steps = int(next(iter(xs.values())).shape[0])
    for _ in range(repeats):
        # fresh device buffers: identical input buffers hit a result cache
        # (measured 14x optimistic on this stack) — see verify skill notes.
        fresh = jax.tree.map(lambda a: a.copy(), xs)
        jax.block_until_ready(fresh)
        t0 = time.perf_counter()
        float(run_all(variables, fresh))  # scalar fetch forces completion
        best = min(best, time.perf_counter() - t0)
    return steps / best


def measure_launch_inclusive(n_scenes: int) -> float:
    """Round-2 methodology: ONE n_scenes-step scan per timed invocation, so
    the ~28 ms tunnel dispatch cost is NOT amortized. Reported alongside the
    sustained number because ~18% of the round-3 36.1->57.7 delta was this
    methodology change, not kernel work (ADVICE r3)."""
    global SCAN_LEN
    old = SCAN_LEN
    SCAN_LEN = n_scenes
    try:
        return measure(n_scenes, repeats=3)
    finally:
        SCAN_LEN = old


def main():
    if os.environ.get("BENCH_CPU_CHILD"):
        # The axon TPU plugin ignores the JAX_PLATFORMS env var; the config
        # flag is honored (must run before any backend is instantiated).
        import jax

        jax.config.update("jax_platforms", "cpu")
        assert jax.devices()[0].platform == "cpu", jax.devices()
        print(json.dumps({"cpu_scenes_per_sec": measure(2, repeats=1)}))
        return

    scenes_per_sec = measure(N_SCENES)
    if os.environ.get("BENCH_LAUNCH_INCLUSIVE", "1") != "0":
        li = measure_launch_inclusive(N_SCENES)
        print(
            f"# launch-inclusive {li:.1f} scenes/s (one {N_SCENES}-scene "
            "scan per dispatch — round-2 methodology); sustained "
            f"{scenes_per_sec:.1f} scenes/s ({SCAN_LEN}-step scan)",
            file=sys.stderr,
        )

    vs = None
    cache_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_baseline_cpu.json"
    )
    if os.environ.get("BENCH_MEASURE_CPU"):
        env = dict(os.environ)
        env["BENCH_CPU_CHILD"] = "1"
        # the CPU baseline is seconds per scene — no launch overhead to
        # amortize; force a short scan regardless of the parent's
        # BENCH_SCAN_LEN (a 64-step CPU scan would blow the timeout and
        # silently fall back to the stale cached baseline — ADVICE r3).
        env["BENCH_SCAN_LEN"] = "2"
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                timeout=3000,
            )
            cpu = json.loads(out.stdout.strip().splitlines()[-1])[
                "cpu_scenes_per_sec"
            ]
            vs = scenes_per_sec / cpu
            with open(cache_path, "w") as f:
                json.dump({"cpu_scenes_per_sec": cpu}, f)
        except Exception:
            vs = None
    if vs is None and os.path.isfile(cache_path):
        with open(cache_path) as f:
            cpu = json.load(f)["cpu_scenes_per_sec"]
        vs = scenes_per_sec / cpu

    print(
        json.dumps(
            {
                "metric": "scenes/sec/chip e2e (voxelize->fuse->detect)",
                "value": round(scenes_per_sec, 3),
                "unit": "scenes/s",
                "vs_baseline": round(vs, 2) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
