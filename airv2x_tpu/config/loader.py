"""YAML experiment-config loader.

Public-API compatible with the reference's ``hypes_yaml.yaml_utils``
(yaml_utils.py:15-55): the YAML selects its own parameter deriver via a
``yaml_parser`` key, scientific-notation floats parse correctly, and training
resumption re-reads ``<model_dir>/config.yaml``. Differences by design:

  * parser hooks live in an explicit registry dict — no ``eval()`` of
    config-supplied strings;
  * derived grid/anchor sizes additionally carry everything the TPU pipeline
    needs statically (padded capacities, BEV map shape).
"""

from __future__ import annotations

import math
import os
import re
from typing import Callable

import numpy as np
import yaml


def _yaml_loader():
    """SafeLoader with a float resolver that accepts 1e-4 style literals
    (pyyaml's default resolver misses floats without a dot)."""
    loader = yaml.SafeLoader
    loader.add_implicit_resolver(
        "tag:yaml.org,2002:float",
        re.compile(
            r"""^(?:[-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
            |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
            |\.[0-9_]+(?:[eE][-+][0-9]+)?
            |[-+]?[0-9][0-9_]*(?::[0-5]?[0-9])+\.[0-9_]*
            |[-+]?\.(?:inf|Inf|INF)
            |\.(?:nan|NaN|NAN))$""",
            re.X,
        ),
        list("-+0123456789."),
    )
    return loader


PARSER_REGISTRY: dict[str, Callable[[dict], dict]] = {}


def register_parser(name: str):
    def deco(fn):
        PARSER_REGISTRY[name] = fn
        return fn

    return deco


def load_yaml(file_path: str, model_dir: str | None = None) -> dict:
    """Load an experiment config; if ``model_dir`` is given and contains a
    ``config.yaml`` snapshot, resume from it (reference yaml_utils.py:31-39).
    """
    if model_dir is not None:
        snapshot = os.path.join(model_dir, "config.yaml")
        if os.path.isfile(snapshot):
            file_path = snapshot

    with open(file_path, "r") as f:
        params = yaml.load(f, Loader=_yaml_loader())

    parser_name = params.get("yaml_parser")
    if parser_name:
        parser = PARSER_REGISTRY.get(parser_name)
        if parser is None:
            raise KeyError(
                f"unknown yaml_parser '{parser_name}'; registered: "
                f"{sorted(PARSER_REGISTRY)}"
            )
        params = parser(params)
    return params


def save_yaml(data: dict, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(_plain(data), f, default_flow_style=False)


def _plain(obj):
    """Recursively convert numpy scalars/arrays so yaml can dump them."""
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, np.generic):
        return obj.item()
    return obj


def _grid_size(lidar_range, voxel_size) -> np.ndarray:
    return np.round(
        (np.array(lidar_range[3:6]) - np.array(lidar_range[0:3]))
        / np.array(voxel_size)
    ).astype(np.int64)


@register_parser("load_airv2x_params")
def load_airv2x_params(param: dict) -> dict:
    """Derive grid / anchor shapes for the AirV2X config family.

    Contract of reference load_airv2x_params (yaml_utils.py:224-299): fills
    per-agent-type ``point_pillar_scatter.grid_size`` and the postprocess
    ``anchor_args`` W/H/D + voxel sizes, plus ``max_cav_num``.
    """
    cav_lidar_range = param["preprocess"]["cav_lidar_range"]
    voxel_size = param["preprocess"]["args"]["voxel_size"]
    max_cav = param["train_params"]["max_cav"]
    max_cav_num = sum(max_cav.get(k, 0) for k in ("vehicle", "rsu", "drone"))
    param["train_params"]["max_cav_num"] = max_cav_num
    param["model"]["args"]["max_cav_num"] = max_cav_num

    for agent in ("vehicle", "rsu", "drone"):
        cfg = param["model"]["args"].get(agent)
        if not cfg or "lidar" not in cfg:
            continue
        gs = _grid_size(cfg["lidar"]["lidar_range"], cfg["lidar"]["voxel_size"])
        cfg["lidar"]["point_pillar_scatter"]["grid_size"] = gs

    anchor_args = param["postprocess"]["anchor_args"]
    vw, vh, vd = voxel_size
    anchor_args["vw"], anchor_args["vh"], anchor_args["vd"] = vw, vh, vd
    anchor_args["W"] = math.ceil((cav_lidar_range[3] - cav_lidar_range[0]) / vw)
    anchor_args["H"] = math.ceil((cav_lidar_range[4] - cav_lidar_range[1]) / vh)
    anchor_args["D"] = math.ceil((cav_lidar_range[5] - cav_lidar_range[2]) / vd)
    return param


@register_parser("load_point_pillar_params")
def load_point_pillar_params(param: dict) -> dict:
    """OPV2V/V2X-R point-pillar family deriver (yaml_utils.py:129-175)."""
    cav_lidar_range = param["preprocess"]["cav_lidar_range"]
    voxel_size = param["preprocess"]["args"]["voxel_size"]
    grid_size = _grid_size(cav_lidar_range, voxel_size)
    if "point_pillar_scatter" in param["model"]["args"]:
        param["model"]["args"]["point_pillar_scatter"]["grid_size"] = grid_size

    anchor_args = param["postprocess"]["anchor_args"]
    vw, vh, vd = voxel_size
    anchor_args["vw"], anchor_args["vh"], anchor_args["vd"] = vw, vh, vd
    anchor_args["W"] = math.ceil((cav_lidar_range[3] - cav_lidar_range[0]) / vw)
    anchor_args["H"] = math.ceil((cav_lidar_range[4] - cav_lidar_range[1]) / vh)
    anchor_args["D"] = math.ceil((cav_lidar_range[5] - cav_lidar_range[2]) / vd)
    return param


@register_parser("load_general_params")
def load_general_params(param: dict) -> dict:
    """Minimal deriver used by some camera/seg configs (yaml_utils.py:573)."""
    if "preprocess" in param and "anchor_args" in param.get("postprocess", {}):
        return load_point_pillar_params(param)
    return param


@register_parser("load_voxel_params")
def load_voxel_params(param: dict) -> dict:
    """Voxel-model deriver (yaml_utils.py:87-127): anchor W/H/D from the
    anchor_args' own lidar range, mirrored into model args."""
    anchor_args = param["postprocess"]["anchor_args"]
    lr = anchor_args["cav_lidar_range"]
    vw, vh, vd = param["preprocess"]["args"]["voxel_size"]
    anchor_args["vw"], anchor_args["vh"], anchor_args["vd"] = vw, vh, vd
    anchor_args["W"] = int((lr[3] - lr[0]) / vw)
    anchor_args["H"] = int((lr[4] - lr[1]) / vh)
    anchor_args["D"] = int((lr[5] - lr[2]) / vd)
    if "model" in param:
        for k in ("W", "H", "D"):
            param["model"]["args"][k] = anchor_args[k]
    return param


@register_parser("load_second_params")
def load_second_params(param: dict) -> dict:
    """SECOND-style deriver (yaml_utils.py:363-404): grid_size into model
    args + floor-division anchor W/H/D."""
    lr = param["preprocess"]["cav_lidar_range"]
    voxel_size = param["preprocess"]["args"]["voxel_size"]
    param["model"]["args"]["grid_size"] = _grid_size(lr, voxel_size)
    anchor_args = param["postprocess"]["anchor_args"]
    vw, vh, vd = voxel_size
    anchor_args["vw"], anchor_args["vh"], anchor_args["vd"] = vw, vh, vd
    anchor_args["W"] = int((lr[3] - lr[0]) / vw)
    anchor_args["H"] = int((lr[4] - lr[1]) / vh)
    anchor_args["D"] = int((lr[5] - lr[2]) / vd)
    return param


@register_parser("load_bev_params")
def load_bev_params(param: dict) -> dict:
    """BEV-grid geometry deriver (yaml_utils.py:406-455): input/label shapes
    from range / res, shared as ``geometry_param``."""
    res = param["preprocess"]["args"]["res"]
    l1, w1, h1, l2, w2, h2 = param["preprocess"]["cav_lidar_range"]
    downsample_rate = param["preprocess"]["args"]["downsample_rate"]
    input_shape = (
        int((l2 - l1) / res), int((w2 - w1) / res), int((h2 - h1) / res) + 1
    )
    geometry_param = {
        "L1": l1, "L2": l2, "W1": w1, "W2": w2, "H1": h1, "H2": h2,
        "downsample_rate": downsample_rate,
        "input_shape": input_shape,
        "label_shape": (
            input_shape[0] // downsample_rate,
            input_shape[1] // downsample_rate,
            7,
        ),
        "res": res,
    }
    param["preprocess"]["geometry_param"] = geometry_param
    param["postprocess"]["geometry_param"] = geometry_param
    param["model"]["args"]["geometry_param"] = geometry_param
    return param


@register_parser("load_lift_splat_shoot_params")
def load_lift_splat_shoot_params(param: dict) -> dict:
    """LSS camera deriver (yaml_utils.py:527-571): ceil-division anchor
    W/H/D (identical arithmetic to the point-pillar deriver)."""
    return load_point_pillar_params(param)


@register_parser("load_airv2x_bm2cp_params")
def load_airv2x_bm2cp_params(param: dict) -> dict:
    """BM2CP deriver (yaml_utils.py:302-360): anchor W/H/D from the shared
    grid plus per-type ``pc_params.point_pillar_scatter.grid_size``.

    Upstream this function is unrunnable — it reads an undefined
    ``rsu_lidar_range`` global (yaml_utils.py:328, NameError); both types
    use the shared ``cav_lidar_range`` here, which is the upstream intent
    (the TODO at yaml_utils.py:320 says veh & rsu share one config)."""
    param = load_airv2x_params(param)
    cav_lidar_range = param["preprocess"]["cav_lidar_range"]
    voxel_size = param["preprocess"]["args"]["voxel_size"]
    gs = _grid_size(cav_lidar_range, voxel_size)
    for agent in ("vehicle", "rsu"):
        cfg = param["model"]["args"].get(agent)
        if cfg and "pc_params" in cfg:
            cfg["pc_params"]["point_pillar_scatter"]["grid_size"] = gs
    return param
