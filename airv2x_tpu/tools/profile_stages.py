"""Per-stage on-chip profile of the flagship inference pipeline.

Times nested prefixes of the bench.py program (same scan methodology:
K steps inside ONE jitted program, scalar fetch, fresh buffers — see
.claude/skills/verify/SKILL.md) so stage costs come out as differences:

  enc        : hetero pillar encoder -> (B, L, ny, nx, C) BEV
  pre_fusion : + backbone + shrink + single-agent psm head
  forward    : + where2comm fusion + final heads (full model forward)
  full       : + box decode + rotated NMS (the bench.py body)

  encoder = enc;  backbone = pre_fusion - enc;
  fusion+heads = forward - pre_fusion;  decode+NMS = full - forward.

Also records per-stage COMPILE seconds (VERDICT r4 item 5: attribute the
cold-compile growth to named program features) and can sweep the pillar
kernel mode (``--modes pallas,xla`` sets AIRV2X_PILLAR_KERNEL per trace —
the env var is trace-time, so each mode gets fresh closures).

Usage:
  python -m airv2x_tpu.tools.profile_stages [--modes pallas,xla]
      [--stages enc,pre_fusion,forward,full] [--scan 64] [--json out.json]

Replaces the stage costs the reference spreads across spconv dataloader
workers, the CUDA model, and shapely CPU NMS (reference call stack:
opencood/tools/inference_multi_scenario.py:338-433).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _stage_fns(model, hypes, anchors, stage):
    import jax
    import jax.numpy as jnp

    from airv2x_tpu.data.postprocess import decode_detections

    lidar_range = jnp.asarray(
        hypes["preprocess"]["cav_lidar_range"], jnp.float32
    )
    tgt = hypes["postprocess"]["target_args"]
    eye = jnp.eye(4)

    def enc_only(m, b):
        return m.encoder(b, False)

    def pre_fusion(m, b):
        x = m.encoder(b, False)
        bsz, l = x.shape[:2]
        flat = x.reshape((bsz * l,) + x.shape[2:])
        feats_2d, _ = m.backbone(flat, False)
        if m.shrink_flag:
            feats_2d = m.shrink_conv(feats_2d, False)
        return m.heads(feats_2d)["psm"]

    def body(variables, batch):
        if stage == "enc":
            out = model.apply(variables, batch, method=enc_only)
            return jnp.sum(out.astype(jnp.float32))
        if stage == "pre_fusion":
            out = model.apply(variables, batch, method=pre_fusion)
            return jnp.sum(out.astype(jnp.float32))
        out = model.apply(variables, batch, train=False)
        if stage == "forward":
            return (
                jnp.sum(out["psm"].astype(jnp.float32))
                + jnp.sum(out["rm"].astype(jnp.float32))
            )
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
        return jnp.sum(det.mask) + jnp.sum(det.scores) * 1e-6

    @jax.jit
    def run_all(variables, xs):
        def step(acc, batch):
            return acc + body(variables, batch), ()

        acc, _ = jax.lax.scan(step, jnp.float32(0), xs)
        return acc

    return run_all


def profile(modes, stages, scan_len, repeats=3):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    sys.path.insert(
        0,
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        ))),
    )
    import bench

    results = {}
    for mode in modes:
        os.environ["AIRV2X_PILLAR_KERNEL"] = mode
        # fresh build per mode: the kernel choice is baked in at trace time
        model, hypes, anchors, variables, xs = bench.build_model_and_inputs(
            bench.N_SCENES, scan_len=scan_len
        )
        steps = int(next(iter(xs.values())).shape[0])
        per_mode = {}
        for stage in stages:
            run_all = _stage_fns(model, hypes, anchors, stage)
            t0 = time.perf_counter()
            compiled = jax.jit(run_all).lower(variables, xs).compile()
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(compiled(variables, xs))
            first_s = time.perf_counter() - t0
            best = float("inf")
            for _ in range(repeats):
                fresh = jax.tree.map(lambda a: a.copy(), xs)
                jax.block_until_ready(fresh)
                t0 = time.perf_counter()
                float(run_all(variables, fresh))
                best = min(best, time.perf_counter() - t0)
            ms = best / steps * 1e3
            per_mode[stage] = {
                "ms_per_scene": round(ms, 3),
                "compile_s": round(compile_s, 1),
                "first_run_s": round(first_s, 2),
            }
            print(
                f"# [{mode}] {stage}: {ms:.2f} ms/scene "
                f"(compile {compile_s:.1f}s, first {first_s:.2f}s)",
                file=sys.stderr,
            )
        # stage deltas
        order = [s for s in ("enc", "pre_fusion", "forward", "full")
                 if s in per_mode]
        deltas = {}
        prev = 0.0
        names = {
            "enc": "encoder", "pre_fusion": "backbone+shrink+psm",
            "forward": "fusion+heads", "full": "decode+nms",
        }
        for s in order:
            cur = per_mode[s]["ms_per_scene"]
            deltas[names[s]] = round(cur - prev, 3)
            prev = cur
        per_mode["deltas_ms"] = deltas
        results[mode] = per_mode
        print(f"# [{mode}] deltas: {deltas}", file=sys.stderr)
    return results


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--modes", default="pallas,xla")
    p.add_argument("--stages", default="enc,pre_fusion,forward,full")
    p.add_argument("--scan", type=int, default=64)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--json", default=None)
    opt = p.parse_args(argv)
    results = profile(
        opt.modes.split(","), opt.stages.split(","), opt.scan, opt.repeats
    )
    line = json.dumps(results)
    print(line)
    if opt.json:
        with open(opt.json, "w") as f:
            f.write(line)


if __name__ == "__main__":
    main()
