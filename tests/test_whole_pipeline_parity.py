"""Whole-tool integration parity (VERDICT r2 item 4): one on-disk fixture
driven through BOTH full pipelines and the resulting AP tables diffed.

Reference side: repo dataset sample -> reference Airv2xWhere2com (torch)
-> reference VoxelPostprocessor.post_process_airv2x -> reference
caluclate_tp_fp x {0.3, 0.5, 0.7} -> reference eval_final_results.

Repo side: the SAME fixture run through the actual CLI tools —
convert_checkpoint (torch .pth -> orbax run dir) then
inference_multi_scenario (dataset walk -> jit infer -> decode -> AP
buckets -> results.txt) — and the combined AP table parsed back.

The two tables must agree to float tolerance: this stitches the seams the
per-module goldens leave open (dataset -> model -> postprocess -> eval in
one run, through the tools' own code paths).
"""

import ast
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from tests.reference_stubs import install_reference_stubs  # noqa: E402

install_reference_stubs()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from tests.test_torch_parity import randomize_batchnorms  # noqa: E402

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _torch_data_dict(batch, layout, hypes):
    """Repo dataset sample -> the reference's collated per-type dict,
    pillarizing each agent's cloud exactly as the repo model does."""
    from airv2x_tpu.ops.voxelize import pillarize

    pre = hypes["preprocess"]
    out = {}
    for t in ("vehicle", "rsu", "drone"):
        sl = layout.slots(t)
        vf, npts, co = [], [], []
        for bi, a in enumerate(
            a for a in range(sl.start, sl.stop) if batch["agent_mask"][a]
        ):
            vox = pillarize(
                jnp.asarray(batch["points"][a]),
                jnp.asarray(batch["points_mask"][a]),
                lidar_range=jnp.asarray(pre["cav_lidar_range"], jnp.float32),
                voxel_size=jnp.asarray(pre["args"]["voxel_size"], jnp.float32),
                grid_size=tuple(
                    int(round((pre["cav_lidar_range"][3 + i]
                               - pre["cav_lidar_range"][i])
                              / pre["args"]["voxel_size"][i]))
                    for i in range(3)
                ),
                max_pillars=int(pre["args"]["max_voxel_train"]),
                max_points_per_pillar=int(pre["args"]["max_points_per_voxel"]),
            )
            m = np.asarray(vox.mask)
            vf.append(np.asarray(vox.voxels)[m])
            npts.append(np.asarray(vox.num_points)[m])
            c = np.asarray(vox.coords)[m]
            co.append(
                np.concatenate([np.full((len(c), 1), bi, c.dtype), c], 1)
            )
        n_t = len(vf)
        out[t] = {
            "batch_merged_lidar_features_torch": {
                "voxel_features": torch.tensor(np.concatenate(vf)),
                "voxel_num_points": torch.tensor(np.concatenate(npts)),
                "voxel_coords": torch.tensor(np.concatenate(co)),
            },
            "batch_idxs": [0],
            "record_len": torch.tensor([n_t]),
        }
    l_total = layout.total
    out["img_pairwise_t_matrix_collab"] = torch.eye(4).repeat(
        1, l_total, l_total, 1, 1
    )
    out["spatial_correction_matrix"] = torch.eye(4).repeat(1, l_total, 1, 1)
    out["prior_encoding"] = torch.tensor(
        np.asarray(batch["prior_encoding"])[None]
    )
    return out


def test_whole_pipeline_ap_table_parity(tmp_path, monkeypatch):
    from opencood.data_utils.post_processor.voxel_postprocessor import (
        VoxelPostprocessor,
    )
    from opencood.models.airv2x_where2com import Airv2xWhere2com
    from opencood.utils.eval_utils_airv2x import (
        caluclate_tp_fp,
        eval_final_results,
    )

    from airv2x_tpu.config import load_yaml, save_yaml
    from airv2x_tpu.data.airv2x_dataset import AirV2XDataset
    from airv2x_tpu.models.base import SlotLayout
    from airv2x_tpu.ops import geometry as geo
    from airv2x_tpu.ops.anchors import generate_anchor_grid
    from airv2x_tpu.tools import convert_checkpoint, inference_multi_scenario
    from tests.fixture_utils import make_fixture

    os.makedirs("debug", exist_ok=True)  # airv2x_where2com.py:137-139

    root = make_fixture(str(tmp_path / "data"))
    hypes = load_yaml(os.path.join(REPO, "hypes_yaml/test/tiny_where2comm.yaml"))
    hypes["preprocess"]["max_points"] = 2048
    # classic PFN on both sides -> identical pillar features
    hypes["preprocess"]["args"]["fast_pillars"] = False
    # the reference hardcodes 64-channel pillars (BaseBEVBackbone(args, 64))
    for t in ("vehicle", "rsu", "drone"):
        hypes["model"]["args"][t]["lidar"]["pillar_vfe"]["num_filters"] = [64]
        hypes["model"]["args"][t]["lidar"]["point_pillar_scatter"][
            "num_features"
        ] = 64
    layout = SlotLayout.from_args(hypes["model"]["args"])

    # ---- reference torch model with randomized weights
    torch.manual_seed(3)
    targs = dict(hypes["model"]["args"])
    targs["where2com_fusion"] = dict(targs["where2com_fusion"])
    ref = Airv2xWhere2com(targs).eval()
    randomize_batchnorms(ref, np.random.default_rng(11))

    # ---- repo side: convert the checkpoint and run the inference tool
    run_dir = tmp_path / "run"
    ckpt = tmp_path / "net_epoch7.pth"
    torch.save({"model_state_dict": ref.state_dict()}, ckpt)
    cfg = tmp_path / "config.yaml"
    save_yaml(hypes, str(cfg))
    monkeypatch.setattr(
        sys, "argv",
        ["convert_checkpoint", "--checkpoint", str(ckpt), "--hypes_yaml",
         str(cfg), "--output", str(run_dir)],
    )
    convert_checkpoint.main()

    monkeypatch.setattr(
        sys, "argv",
        ["inference_multi_scenario", "--model_dir", str(run_dir),
         "--test_dir", root, "--epoch", "1"],
    )
    inference_multi_scenario.main()
    lines = open(run_dir / "results.txt").read().strip().splitlines()
    combined = next(l for l in lines if l.startswith("COMBINED:"))
    repo_ap = ast.literal_eval(combined[len("COMBINED:"):].strip())

    # ---- reference side: same dataset samples through the torch pipeline
    pp_params = dict(hypes["postprocess"])
    pp_params["ego_type"] = "vehicle"
    ref_pp = VoxelPostprocessor(pp_params, dataset=None, train=False)
    anchors = generate_anchor_grid(hypes["postprocess"]["anchor_args"])

    result_stat = {
        t: {"tp": [], "fp": [], "gt": 0, "score": []} for t in (0.3, 0.5, 0.7)
    }
    ds = AirV2XDataset(hypes, root, train=False)
    for i in range(len(ds)):
        batch, gt = ds[i]
        data_dict = _torch_data_dict(batch, layout, hypes)
        with torch.no_grad():
            out = ref(data_dict)
        pp_in = {
            "ego": {
                "transformation_matrix": torch.eye(4),
                "anchor_box": torch.tensor(anchors),
            }
        }
        pp_out = {"ego": {k: out[k] for k in ("psm", "rm", "obj")}}
        corners, scores, labels, boxes = ref_pp.post_process_airv2x(
            pp_in, pp_out
        )
        gt_boxes = gt["boxes"][gt["mask"]]
        gt_c = torch.tensor(
            np.asarray(
                geo.boxes_to_corners_bev(jnp.asarray(gt_boxes), order="hwl")
            )
        )
        for t in (0.3, 0.5, 0.7):
            caluclate_tp_fp(corners, scores, gt_c, result_stat, t)

    ap30, ap50, ap70 = eval_final_results(
        result_stat, str(tmp_path), eval_epoch=1
    )

    assert abs(repo_ap["ap_30"] - ap30) < 1e-6, (repo_ap, ap30)
    assert abs(repo_ap["ap_50"] - ap50) < 1e-6, (repo_ap, ap50)
    assert abs(repo_ap["ap_70"] - ap70) < 1e-6, (repo_ap, ap70)
