"""Smoke/regression tests for the round-5 measurement-campaign tools.

The real measurements run on the chip (artifacts in doc/); these tests pin
the CPU-safe plumbing: batch construction, workload builders at tiny
scale, results parsing — so the tools don't bitrot between campaigns.
"""

import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_train_build_inputs_stacks_labels_leafwise():
    """Regression: labels is a nested dict; np.stack over dicts used to
    produce object arrays that jnp.asarray rejects."""
    from airv2x_tpu.config import load_yaml
    from airv2x_tpu.models.base import SlotLayout
    from airv2x_tpu.tools import bench_train

    hypes = load_yaml(
        os.path.join(REPO, "hypes_yaml/test/tiny_where2comm.yaml")
    )
    layout = SlotLayout.from_args(hypes["model"]["args"])
    bench_train.POINTS_PER_AGENT = 64
    xs = bench_train.build_inputs(hypes, layout, batch_size=2, steps=3)
    assert isinstance(xs["labels"], dict)
    for leaf in xs["labels"].values():
        assert leaf.dtype != object
        assert leaf.shape[:2] == (3, 2)
    assert xs["points"].shape[:2] == (3, 2)


def test_bench_workloads_temporal_contract():
    """The temporal_det builder must satisfy scope_model's batch contract
    (T-stacked points/masks/transforms + identity history)."""
    import airv2x_tpu.tools.bench_workloads as bw

    old_pts, old_sc = bw.POINTS_PER_AGENT, bw.N_SCENES
    bw.POINTS_PER_AGENT, bw.N_SCENES = 256, 2
    try:
        v, xs, run_all = bw.build_workload("temporal_det", 2)
        assert xs["points"].ndim == 6  # (scan, B, T, L, N, 4)
        assert xs["points"].shape[2] == 2  # T frames
        assert xs["history_t"].shape[-2:] == (4, 4)
        acc = float(run_all(v, xs))
        assert np.isfinite(acc)
    finally:
        bw.POINTS_PER_AGENT, bw.N_SCENES = old_pts, old_sc


def test_chip_ap_gate_parse_results(tmp_path):
    from airv2x_tpu.tools.chip_ap_gate import parse_results

    (tmp_path / "results.txt").write_text(
        "synthetic_1: {'ap_30': 0.5, 'ap_50': 0.4, 'ap_70': 0.2}\n"
        "COMBINED: {'ap_30': 0.5, 'ap_50': 0.4, 'ap_70': 0.2, "
        "'comm_rate': 1.0}\n"
    )
    table = parse_results(str(tmp_path))
    assert table["COMBINED"]["ap_50"] == 0.4
    assert "synthetic_1" in table


def test_probe_conv_tiny_runs():
    import airv2x_tpu.tools.probe_conv as pc

    old = pc.STAGES
    pc.STAGES = {"tiny": (1, 8, 16, 8)}
    try:
        res = pc.probe(scan_len=1, depth=1)
    finally:
        pc.STAGES = old
    assert set(res) == {
        "tiny/conv3x3", "tiny/matmul9c", "tiny/conv1x1_9c", "tiny/im2col"
    }
    for v in res.values():
        assert v["ms_per_op"] > 0
