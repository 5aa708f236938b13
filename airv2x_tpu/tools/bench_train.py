"""On-chip training-throughput benchmark for the flagship where2comm model.

Measures full-scale train steps (704x200 grid, 3 veh + 2 rsu + 1 drone,
20k pts/agent, bf16 compute, fwd + loss + bwd + adam) at the reference's
published setting batch_size=2 (/root/reference/readme.md:112-113) and
around it, for the B>=4 scheduling-cliff mitigations:

  base        : plain step
  fence       : AIRV2X_ENC_BARRIER=type (scheduling fence between the
                per-agent-type encoder branches — trace-time env var)
  accum2      : --grad_accum 2 (B as 2 sequential microbatches, one update)
  fence+accum : both

Methodology: K train steps folded into ONE jitted lax.scan carrying the
TrainState, scalar fetch, fresh batch buffers per repeat (see
.claude/skills/verify/SKILL.md for why anything else lies through the
axon tunnel). Each (B, setting) cell is its own trace: the fence env var
is trace-time, accum changes the graph.

Usage:
  python -m airv2x_tpu.tools.bench_train [--batches 1,2,4]
      [--settings base,fence,accum2,fence_accum2] [--steps 6]
      [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

NUM_AGENTS = {"vehicle": 3, "rsu": 2, "drone": 1}
POINTS_PER_AGENT = 20000


def build_inputs(hypes, layout, batch_size: int, steps: int, seed: int = 0):
    """steps distinct full-scale labelled batches, stacked on a scan axis."""
    from airv2x_tpu.data.synthetic import make_batch
    from airv2x_tpu.ops.anchors import anchor_standup_boxes, generate_anchor_grid

    anchors = generate_anchor_grid(hypes["postprocess"]["anchor_args"])
    standup = anchor_standup_boxes(anchors)
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(steps):
        b, _ = make_batch(
            rng,
            layout,
            batch_size=batch_size,
            anchors=anchors,
            anchor_standup=standup,
            target_args=hypes["postprocess"]["target_args"],
            num_objects=12,
            num_agents=dict(NUM_AGENTS),
            points_per_agent=POINTS_PER_AGENT,
            lidar_range=hypes["preprocess"]["cav_lidar_range"],
            max_boxes=hypes["postprocess"]["max_num"],
            pts_per_box=100,
        )
        batches.append(b)
    import jax

    # labels is a nested dict — stack leaf-wise, not dict-wise
    return jax.tree.map(lambda *xs: np.stack(xs), *batches)


def bench_cell(hypes, batch_size: int, setting: str, steps: int,
               repeats: int = 3):
    import jax
    import jax.numpy as jnp

    from airv2x_tpu.loss import build_loss
    from airv2x_tpu.models import build_model
    from airv2x_tpu.models.base import SlotLayout
    from airv2x_tpu.parallel.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    import re

    fence = "fence" in setting
    m = re.search(r"accum(\d+)", setting)
    accum = int(m.group(1)) if m else 1
    if batch_size % accum:
        return None
    os.environ["AIRV2X_ENC_BARRIER"] = "type" if fence else ""

    model = build_model(hypes)
    layout = SlotLayout.from_args(hypes["model"]["args"])
    loss_fn = build_loss(hypes)
    tx, _ = make_optimizer(hypes, steps_per_epoch=50)

    xs_np = build_inputs(hypes, layout, batch_size, steps)
    xs = jax.tree.map(jnp.asarray, xs_np)
    example = jax.tree.map(lambda a: a[0], xs)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)},
        example,
    )
    state = create_train_state(model, variables, tx)
    raw_step = make_train_step(
        model, loss_fn, tx, donate=False, accum_steps=accum, jit=False
    )
    rng = jax.random.PRNGKey(7)

    @jax.jit
    def run_all(state, xs):
        def body(st, batch):
            st, parts = raw_step(st, batch, rng)
            return st, ()

        st, _ = jax.lax.scan(body, state, xs)
        # one param leaf + step count: forces the whole chain to completion
        leaf = jax.tree.leaves(st.params)[0]
        return st.step + jnp.sum(leaf.astype(jnp.float32)) * 1e-9

    t0 = time.perf_counter()
    compiled = jax.jit(run_all).lower(state, xs).compile()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(compiled(state, xs))
    first_s = time.perf_counter() - t0

    best = float("inf")
    for _ in range(repeats):
        fresh = jax.tree.map(lambda a: a.copy(), xs)
        jax.block_until_ready(fresh)
        t0 = time.perf_counter()
        float(run_all(state, fresh))
        best = min(best, time.perf_counter() - t0)
    ms = best / steps * 1e3
    return {
        "ms_per_step": round(ms, 1),
        "scenes_per_sec": round(batch_size * steps / best, 2),
        "compile_s": round(compile_s, 1),
        "first_run_s": round(first_s, 2),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="1,2,4")
    p.add_argument("--settings", default="base,fence,accum2,fence_accum2")
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--json", default=None)
    opt = p.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from airv2x_tpu.config import load_yaml

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)
    )))
    hypes = load_yaml(
        os.path.join(repo, "hypes_yaml/airv2x/lidar/det/where2comm.yaml")
    )
    hypes["model"]["args"]["dtype"] = os.environ.get("BENCH_DTYPE", "bf16")
    hypes["model"]["args"]["max_cav"] = dict(NUM_AGENTS)
    hypes["train_params"]["max_cav"] = dict(NUM_AGENTS)

    results = {}
    for b in (int(x) for x in opt.batches.split(",")):
        for setting in opt.settings.split(","):
            if "accum" in setting and b < 2:
                continue
            cell = bench_cell(hypes, b, setting, opt.steps, opt.repeats)
            if cell is None:
                continue
            key = f"B{b}/{setting}"
            results[key] = cell
            print(f"# {key}: {cell}", file=sys.stderr)
    line = json.dumps(results)
    print(line)
    if opt.json:
        with open(opt.json, "w") as f:
            f.write(line)


if __name__ == "__main__":
    main()
