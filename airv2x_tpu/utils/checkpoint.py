"""Checkpoint save/restore (orbax) with the reference's run-dir layout.

Mirrors tools/train_utils.py semantics: run dir ``logs/<name>__<timestamp>/``
holding a ``config.yaml`` snapshot (setup_train :255-285), epoch-indexed
checkpoints (``net_epoch{N}`` — reference saves ``net_epoch{N}.pth``
:250-260), resume from the latest epoch (:53-62), and best-epoch selection
by parsing ``validation_loss.txt`` (:159-205).
"""

from __future__ import annotations

import os
import re
from datetime import datetime

import orbax.checkpoint as ocp

from airv2x_tpu.config import save_yaml


def setup_train_dir(hypes: dict, base_dir: str = "logs") -> str:
    name = hypes.get("name", "experiment")
    stamp = datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
    run_dir = os.path.join(base_dir, f"{name}__{stamp}")
    os.makedirs(run_dir, exist_ok=True)
    save_yaml(hypes, os.path.join(run_dir, "config.yaml"))
    return run_dir


def _ckpt_dir(run_dir: str, epoch: int) -> str:
    return os.path.abspath(os.path.join(run_dir, f"net_epoch{epoch}"))


def save_checkpoint(run_dir: str, epoch: int, state) -> None:
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(_ckpt_dir(run_dir, epoch), state, force=True)
    ckptr.wait_until_finished()


def find_last_epoch(run_dir: str) -> int:
    """Latest saved epoch index, 0 if none (reference findLastCheckPoint)."""
    if not os.path.isdir(run_dir):
        return 0
    epochs = [
        int(m.group(1))
        for f in os.listdir(run_dir)
        if (m := re.match(r"net_epoch(\d+)$", f))
    ]
    return max(epochs, default=0)


def load_checkpoint(run_dir: str, epoch: int, target):
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(_ckpt_dir(run_dir, epoch), target=target)


def find_best_epoch(run_dir: str) -> int:
    """Lowest-validation-loss epoch from validation_loss.txt, else latest."""
    path = os.path.join(run_dir, "validation_loss.txt")
    if not os.path.isfile(path):
        return find_last_epoch(run_dir)
    best, best_loss = None, float("inf")
    with open(path) as f:
        for line in f:
            m = re.match(r"epoch[: ]+(\d+).*loss[: ]+([0-9.eE+-]+)", line.strip())
            if m:
                e, v = int(m.group(1)), float(m.group(2))
                if v < best_loss and os.path.isdir(_ckpt_dir(run_dir, e)):
                    best, best_loss = e, v
    return best if best is not None else find_last_epoch(run_dir)
