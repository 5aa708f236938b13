"""Lightweight tracing/profiling helpers (the reference has none —
SURVEY.md §5 lists this as a gap to fill in the rebuild).

``StepTimer`` measures on-device step time honestly on the axon tunnel
(fetches a scalar to force completion); ``device_memory_stats`` reports live
HBM usage; ``trace`` wraps jax.profiler for deep dives.
"""

from __future__ import annotations

import contextlib
import json
import os
import time

import jax


class StepTimer:
    """Accumulates wall-time samples; report() gives min/mean/p50."""

    def __init__(self):
        self.samples: list[float] = []

    @contextlib.contextmanager
    def measure(self, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.samples.append(time.perf_counter() - t0)

    def report(self) -> dict:
        if not self.samples:
            return {}
        s = sorted(self.samples)
        return {
            "n": len(s),
            "min_s": s[0],
            "p50_s": s[len(s) // 2],
            "mean_s": sum(s) / len(s),
        }


def device_memory_stats() -> dict:
    """Per-device live/peak HBM bytes where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            ms = d.memory_stats()
        except Exception:
            continue
        if ms:
            out[str(d)] = {
                "bytes_in_use": ms.get("bytes_in_use"),
                "peak_bytes_in_use": ms.get("peak_bytes_in_use"),
                "bytes_limit": ms.get("bytes_limit"),
            }
    return out


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """jax.profiler trace scope (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class MetricsLogger:
    """Append-only JSONL metrics stream (tensorboard-file replacement)."""

    def __init__(self, run_dir: str, name: str = "metrics.jsonl"):
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, name)

    def log(self, step: int, **metrics):
        rec = {"step": int(step)}
        rec.update({k: float(v) for k, v in metrics.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
