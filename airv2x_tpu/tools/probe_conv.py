"""Calibrated conv-efficiency probe for the BEV backbone shapes.

Round-5 diagnostic: the stage profile puts the backbone at 7.84 ms/scene
(~44 TFLOP/s by hand FLOP count) — the dominant stage. Before writing a
Pallas conv kernel, measure what XLA's 3x3 conv lowering actually sustains
at each stage's shape, against a same-FLOPs matmul ceiling, with per-step
overhead amortized away: each scan step applies a CHAIN of ``depth`` convs
(distinct weights, carried activation), so any fixed per-step cost is
diluted 1/depth. bf16 operands, scalar fetch, fresh buffers (see
.claude/skills/verify/SKILL.md).

Backbone shapes (where2comm flagship, 6 maps = 3 veh + 2 rsu + 1 drone):
  stage1: (6, 100, 352,  64)  3x3 x  64 -> 64
  stage2: (6,  50, 176, 128)  3x3 x 128 -> 128
  stage3: (6,  25,  88, 256)  3x3 x 256 -> 256

Usage: python -m airv2x_tpu.tools.probe_conv [--scan 16] [--depth 8]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np

STAGES = {
    "stage1": (6, 100, 352, 64),
    "stage2": (6, 50, 176, 128),
    "stage3": (6, 25, 88, 256),
}


def _time_chain(apply_one, x0, weights, scan_len, flops_per_apply, repeats=3):
    """Time scan_len steps of a depth-len(weights) chain in ONE jit."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, ws):
        def step(carry, _):
            y = carry
            for w in ws:
                y = apply_one(y, w)
            # renorm so the chain doesn't overflow across scan steps
            y = y * (0.25 / (jnp.mean(jnp.abs(y)) + 1e-3))
            return y, ()

        y, _ = jax.lax.scan(step, x, None, length=scan_len)
        return jnp.sum(y.astype(jnp.float32))

    t0 = time.perf_counter()
    compiled = run.lower(x0, weights).compile()
    compile_s = time.perf_counter() - t0
    float(compiled(x0, weights))
    best = float("inf")
    for _ in range(repeats):
        fresh = x0.copy()
        import jax

        jax.block_until_ready(fresh)
        t0 = time.perf_counter()
        float(run(fresh, weights))
        best = min(best, time.perf_counter() - t0)
    n_apply = scan_len * len(weights)
    ms = best / n_apply * 1e3
    tflops = flops_per_apply / (ms * 1e-3) / 1e12
    return {"ms_per_op": round(ms, 4), "tflops": round(tflops, 1),
            "compile_s": round(compile_s, 1)}


def probe(scan_len: int, depth: int):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    rng = np.random.default_rng(0)
    out = {}
    for name, (b, h, w, c) in STAGES.items():
        x0 = jnp.asarray(
            rng.standard_normal((b, h, w, c)) * 0.1, jnp.bfloat16
        )
        flops = 2 * b * h * w * c * c * 9

        def conv3(y, wt):
            return jax.lax.conv_general_dilated(
                y, wt, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        ws3 = tuple(
            jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.bfloat16)
            for _ in range(depth)
        )
        out[f"{name}/conv3x3"] = _time_chain(conv3, x0, ws3, scan_len, flops)

        # same-FLOPs matmul ceiling: (b*h*w, 9c) @ (9c, c), carried as an
        # (M, c) accumulator so no extra traffic is charged to the op
        xm = jnp.asarray(
            rng.standard_normal((b * h * w, 9 * c)) * 0.1, jnp.bfloat16
        )

        def mat(acc, wt):
            return acc * jnp.bfloat16(0.5) + xm @ wt

        acc0 = jnp.zeros((b * h * w, c), jnp.bfloat16)
        wsm = tuple(
            jnp.asarray(rng.standard_normal((9 * c, c)) * 0.05, jnp.bfloat16)
            for _ in range(depth)
        )
        out[f"{name}/matmul9c"] = _time_chain(mat, acc0, wsm, scan_len, flops)

        # 1x1 conv at 9x channel width (same FLOPs, conv lowering)
        x1 = jnp.asarray(
            rng.standard_normal((b, h, w, 9 * c)) * 0.1, jnp.bfloat16
        )

        def conv1(acc, wt):
            return acc * jnp.bfloat16(0.5) + jax.lax.conv_general_dilated(
                x1, wt, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        acc1 = jnp.zeros((b, h, w, c), jnp.bfloat16)
        ws1 = tuple(
            jnp.asarray(
                rng.standard_normal((1, 1, 9 * c, c)) * 0.05, jnp.bfloat16
            )
            for _ in range(depth)
        )
        out[f"{name}/conv1x1_9c"] = _time_chain(conv1, acc1, ws1, scan_len, flops)

        # XLA im2col: materialise (b,h,w,9c) patches in HBM, then one
        # matmul — pays 9x activation traffic to buy the matmul rate
        def im2col(y, wt):
            p = jax.lax.conv_general_dilated_patches(
                y, (3, 3), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            z = p.reshape(b * h * w, 9 * c) @ wt
            return z.reshape(b, h, w, c)

        wsp = tuple(
            jnp.asarray(rng.standard_normal((9 * c, c)) * 0.05, jnp.bfloat16)
            for _ in range(depth)
        )
        out[f"{name}/im2col"] = _time_chain(im2col, x0, wsp, scan_len, flops)
        for k in (f"{name}/conv3x3", f"{name}/matmul9c",
                  f"{name}/conv1x1_9c", f"{name}/im2col"):
            print(f"# {k}: {out[k]}", file=sys.stderr)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scan", type=int, default=16)
    p.add_argument("--depth", type=int, default=8)
    p.add_argument("--json", default=None)
    opt = p.parse_args(argv)
    res = probe(opt.scan, opt.depth)
    line = json.dumps(res)
    print(line)
    if opt.json:
        with open(opt.json, "w") as f:
            f.write(line)


if __name__ == "__main__":
    main()
