"""End-to-end synthetic demo: train tiny where2comm, clear the eval gate.

Reproduces the README demo-gate claim from scratch through the REAL CLIs —
``tools/train.py`` (synthetic scenes) then ``tools/inference_multi_scenario``
— and archives the evidence (results.txt, eval detections yaml, loss curves,
config snapshot) so the claim is verifiable from the repo. Mirrors the
reference's committed eval-protocol outputs
(/root/reference/opencood/utils/eval_utils_airv2x.py:162-196 writes
results.txt + eval yaml into the run dir).

  python -m airv2x_tpu.tools.demo [--epochs 130] [--archive doc/demo_artifacts]

The training recipe is the round-3 demo setting: the shipped multistep
schedule decays the lr to 2e-6 by epoch 40 (freezing the objectness head
before it converges), so the demo trains 130 epochs with decays at 70/110.
Use ``--epochs 2 --steps 4`` for a smoke run (tests do).
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import shutil
import sys


def parse_args():
    p = argparse.ArgumentParser(description="airv2x_tpu synthetic demo")
    p.add_argument("--epochs", type=int, default=130)
    p.add_argument("--steps", type=int, default=50, help="steps per epoch")
    p.add_argument("--log_dir", type=str, default="logs")
    p.add_argument(
        "--archive", type=str, default="",
        help="directory to copy the gate evidence into (e.g. "
        "doc/demo_artifacts); empty = leave it in the run dir only",
    )
    p.add_argument("--num_scenes", type=int, default=16, help="eval scenes")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def run_cli(main_fn, argv):
    old = sys.argv
    sys.argv = ["prog"] + argv
    try:
        main_fn()
    finally:
        sys.argv = old


def main():
    opt = parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from airv2x_tpu.config import load_yaml, save_yaml

    # Round-3 demo recipe on top of the tiny config: longer schedule with
    # the lr decays moved past the convergence plateau (70/110), periodic
    # eval so find_best_epoch has a validation curve to pick from.
    hypes = load_yaml(os.path.join(repo, "hypes_yaml/test/tiny_where2comm.yaml"))
    hypes["train_params"]["epoches"] = opt.epochs
    hypes["train_params"]["save_freq"] = max(opt.epochs // 13, 1)
    hypes["train_params"]["eval_freq"] = max(opt.epochs // 13, 1)
    hypes["lr_scheduler"]["step_size"] = [
        max(int(opt.epochs * 70 / 130), 1), max(int(opt.epochs * 110 / 130), 2)
    ]
    cfg_path = os.path.join(opt.log_dir, "demo_where2comm.yaml")
    os.makedirs(opt.log_dir, exist_ok=True)
    save_yaml(hypes, cfg_path)

    before = set(os.listdir(opt.log_dir))
    from airv2x_tpu.tools import train

    run_cli(train.main, [
        "--hypes_yaml", cfg_path,
        "--log_dir", opt.log_dir,
        "--steps_per_epoch", str(opt.steps),
        "--seed", str(opt.seed),
        "--synthetic",
    ])
    new = [d for d in os.listdir(opt.log_dir) if d not in before
           and os.path.isdir(os.path.join(opt.log_dir, d))]
    assert len(new) == 1, f"expected one new run dir, got {new}"
    run_dir = os.path.join(opt.log_dir, new[0])
    print(f"demo run dir: {run_dir}")

    from airv2x_tpu.tools import inference_multi_scenario

    run_cli(inference_multi_scenario.main, [
        "--model_dir", run_dir,
        "--num_scenes", str(opt.num_scenes),
    ])

    # parse the COMBINED AP line the tool appended
    combined = None
    with open(os.path.join(run_dir, "results.txt")) as f:
        for line in f:
            if line.startswith("COMBINED:"):
                # literal_eval: the COMBINED payload is a plain dict literal;
                # never execute code from a run dir (ADVICE r4)
                combined = ast.literal_eval(line.split(":", 1)[1].strip())
    assert combined is not None, "inference wrote no COMBINED line"
    gate = {k: combined[k] for k in ("ap_30", "ap_50", "ap_70")}
    summary = {
        "epochs": opt.epochs,
        "steps_per_epoch": opt.steps,
        "obj_threshold": hypes["postprocess"]["target_args"]["obj_threshold"],
        "ap": gate,
        "gate": "PASS" if min(gate.values()) > 0.2 else "FAIL",
    }
    with open(os.path.join(run_dir, "demo_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("demo summary:", json.dumps(summary))

    if opt.archive:
        os.makedirs(opt.archive, exist_ok=True)
        for name in ("results.txt", "train_loss.txt", "validation_loss.txt",
                     "config.yaml", "demo_summary.json"):
            src = os.path.join(run_dir, name)
            if os.path.isfile(src):
                shutil.copy(src, os.path.join(opt.archive, name))
        print(f"archived gate evidence to {opt.archive}")


if __name__ == "__main__":
    main()
