"""Convert a reference PyTorch checkpoint into an airv2x_tpu run dir.

  python -m airv2x_tpu.tools.convert_checkpoint \
      --checkpoint net_epoch50.pth --hypes_yaml config.yaml --output rundir

Mirrors the reference's checkpoint-loading semantics
(tools/train_utils.py:35-252: ``module.`` prefix strip, shape-mismatch skip)
and emits the repo's run-dir layout (config snapshot + orbax ``net_epoch{N}``
with a fresh optimizer state), so every inference tool can consume the
converted model via ``--model_dir``.

The numeric mapping (conv/linear/BN transposes, deconv flip) is validated
against the actual reference torch modules in tests/test_torch_parity.py.
"""

from __future__ import annotations

import argparse
import os


def parse_args():
    p = argparse.ArgumentParser(description="torch -> flax checkpoint convert")
    p.add_argument("--checkpoint", required=True, help=".pth state dict")
    p.add_argument(
        "--hypes_yaml",
        required=True,
        help="experiment yaml (the reference run dir's config.yaml works)",
    )
    p.add_argument("--output", required=True, help="output run dir")
    p.add_argument(
        "--epoch", type=int, default=1, help="epoch index for the saved ckpt"
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--verbose", action="store_true")
    return p.parse_args()


def main():
    opt = parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    from airv2x_tpu.config import load_yaml, save_yaml
    from airv2x_tpu.models import build_model
    from airv2x_tpu.models.base import SlotLayout
    from airv2x_tpu.parallel.train import create_train_state, make_optimizer
    from airv2x_tpu.tools.train import synthetic_batches
    from airv2x_tpu.utils.checkpoint import save_checkpoint
    from airv2x_tpu.utils.torch_convert import convert_state_dict

    hypes = load_yaml(opt.hypes_yaml)
    sd = torch.load(opt.checkpoint, map_location="cpu", weights_only=False)
    if not isinstance(sd, dict):
        sd = sd.state_dict()

    model = build_model(hypes)
    layout = SlotLayout.from_args(hypes["model"]["args"])
    example = next(synthetic_batches(hypes, layout, 1, 1, opt.seed))
    example = jax.tree.map(jnp.asarray, example)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(opt.seed), "comm": jax.random.PRNGKey(1)},
        example,
    )
    variables = jax.device_get(variables)

    asg = convert_state_dict(sd, variables, hypes)
    print(
        f"converted {len(asg.assigned)} tensors; "
        f"skipped {len(asg.skipped)}; "
        f"torch leftovers {len(getattr(asg, 'torch_leftovers', []))}"
    )
    if opt.verbose:
        for s in asg.skipped:
            print("  skipped:", s)
        for s in getattr(asg, "torch_leftovers", []):
            print("  leftover:", s)

    tx, _ = make_optimizer(hypes, steps_per_epoch=1)
    state = create_train_state(model, asg.variables, tx)

    os.makedirs(opt.output, exist_ok=True)
    save_yaml(hypes, os.path.join(opt.output, "config.yaml"))
    save_checkpoint(opt.output, opt.epoch, jax.device_get(state))
    print(f"saved {os.path.join(opt.output, f'net_epoch{opt.epoch}')}")


if __name__ == "__main__":
    main()
