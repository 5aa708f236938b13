"""Multi-stage (HEAL/STAMP) collaborative training CLI.

Twin of tools/train_stamp.py: stage 1 trains per-agent-type models with
single-agent configs; stage 2 loads those checkpoints in drone -> rsu ->
vehicle order (train_stamp.py:166-179, vehicle last so shared modules keep
the ego weights), freezes the config-listed submodules
(``model.args.backbone_fix``: true, or a list of agent types —
airv2x_heal.backbone_fix :71-131), and trains the rest.

Partial/heterogeneous checkpoint loading follows train_utils.load_model
semantics (:90-116): parameters whose shapes mismatch are skipped,
missing keys keep their fresh initialization.

  python -m airv2x_tpu.tools.train_multi_stage --hypes_yaml <collab cfg> \
      --drone_dir <run> --rsu_dir <run> --vehicle_dir <run>
"""

from __future__ import annotations

import argparse

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--hypes_yaml", type=str, required=True)
    p.add_argument("--vehicle_dir", type=str, default="")
    p.add_argument("--rsu_dir", type=str, default="")
    p.add_argument("--drone_dir", type=str, default="")
    p.add_argument("--log_dir", type=str, default="logs")
    p.add_argument("--epochs", type=int, default=0)
    p.add_argument("--steps_per_epoch", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def merge_compatible(target_params, source_params):
    """Copy leaves whose path+shape match (train_utils.load_model :90-116)."""
    import flax

    tgt = flax.traverse_util.flatten_dict(target_params)
    src = flax.traverse_util.flatten_dict(source_params)
    copied = 0
    for k, v in src.items():
        if k in tgt and tgt[k].shape == v.shape:
            tgt[k] = v
            copied += 1
    return flax.traverse_util.unflatten_dict(tgt), copied


def main():
    opt = parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from airv2x_tpu.config import load_yaml
    from airv2x_tpu.loss import build_loss
    from airv2x_tpu.models import build_model
    from airv2x_tpu.models.base import SlotLayout
    from airv2x_tpu.parallel.train import (
        backbone_fix_prefixes,
        create_train_state,
        freeze_by_path,
        make_optimizer,
        make_train_step,
    )
    from airv2x_tpu.tools.train import synthetic_batches
    from airv2x_tpu.utils.checkpoint import (
        find_best_epoch,
        load_checkpoint,
        save_checkpoint,
        setup_train_dir,
    )

    hypes = load_yaml(opt.hypes_yaml)
    tp = hypes["train_params"]
    epochs = opt.epochs or int(tp["epoches"])
    batch_size = opt.batch_size or int(tp["batch_size"])
    steps_per_epoch = opt.steps_per_epoch or int(tp.get("steps_per_epoch", 50))

    model = build_model(hypes)
    layout = SlotLayout.from_args(hypes["model"]["args"])
    loss_fn = build_loss(hypes)
    tx, _ = make_optimizer(hypes, steps_per_epoch)

    example = next(synthetic_batches(hypes, layout, batch_size, 1, opt.seed))
    example = jax.tree.map(jnp.asarray, example)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(opt.seed), "comm": jax.random.PRNGKey(1)},
        example,
    )
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    # stage-1 checkpoint loads: drone -> rsu -> vehicle (ego last)
    for name, run_dir in (
        ("drone", opt.drone_dir),
        ("rsu", opt.rsu_dir),
        ("vehicle", opt.vehicle_dir),
    ):
        if not run_dir:
            continue
        src_hypes = load_yaml(None, run_dir)
        src_model = build_model(src_hypes)
        src_layout = SlotLayout.from_args(src_hypes["model"]["args"])
        src_example = next(
            synthetic_batches(src_hypes, src_layout, 1, 1, opt.seed)
        )
        src_example = jax.tree.map(jnp.asarray, src_example)
        src_vars = jax.jit(lambda r, b: src_model.init(r, b, train=False))(
            {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)},
            src_example,
        )
        src_tx, _ = make_optimizer(src_hypes)
        src_state = create_train_state(src_model, src_vars, src_tx)
        epoch = find_best_epoch(run_dir)
        if epoch:
            src_state = load_checkpoint(run_dir, epoch, jax.device_get(src_state))
        params, n = merge_compatible(params, src_state.params)
        stats, m = merge_compatible(stats, src_state.batch_stats)
        print(f"loaded {name} stage-1 checkpoint: {n} params, {m} stats leaves")

    frozen = backbone_fix_prefixes(hypes["model"]["args"])
    if frozen:
        print("freezing:", frozen)
        tx = freeze_by_path(tx, params, frozen)

    state = create_train_state(model, {"params": params, "batch_stats": stats}, tx)
    run_dir = setup_train_dir(hypes, opt.log_dir)
    step = make_train_step(model, loss_fn, tx, donate=False)
    rng = jax.random.PRNGKey(opt.seed)

    for epoch in range(epochs):
        losses = []
        for batch in synthetic_batches(
            hypes, layout, batch_size, steps_per_epoch, opt.seed + epoch + 1
        ):
            batch = jax.tree.map(jnp.asarray, batch)
            state, parts = step(state, batch, rng)
            losses.append(float(parts["total_loss"]))
        print(f"epoch {epoch + 1}/{epochs} loss {np.mean(losses):.3f}")
        save_checkpoint(run_dir, epoch + 1, jax.device_get(state))

    print("stage-2 training finished:", run_dir)


if __name__ == "__main__":
    main()
