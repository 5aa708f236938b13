from __future__ import annotations

from typing import Callable

LOSS_REGISTRY: dict[str, Callable] = {}


def register_loss(*names: str):
    def deco(fn):
        for n in names:
            LOSS_REGISTRY[n] = fn
        return fn

    return deco


def build_loss(hypes: dict):
    """Return a pure loss fn for the config's task (reference create_loss,
    tools/train_utils.py:328-368, per-task det/seg selection)."""
    loss_cfg = hypes["loss"]
    task = hypes["model"]["args"].get("task", "det")
    cfg = loss_cfg[task] if task in loss_cfg else loss_cfg
    name = cfg["core_method"]
    if name not in LOSS_REGISTRY:
        raise KeyError(f"unknown loss '{name}'; known: {sorted(LOSS_REGISTRY)}")
    return LOSS_REGISTRY[name](cfg["args"])
