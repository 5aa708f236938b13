"""Training CLI (twin of reference tools/train.py, TPU-native loop).

  python -m airv2x_tpu.tools.train --hypes_yaml <cfg> [--model_dir <resume>]

Differences from the reference by design: the train step (forward + loss +
backward + update) is ONE jitted SPMD program over a ``jax.sharding.Mesh``;
multi-chip data parallelism needs no torchrun/DDP — the same script scales
by sharding the batch axis (gradient psums inserted by XLA); AMP is replaced
by native bf16 compute. Checkpoints, loss logs (train_loss.txt /
validation_loss.txt), config snapshot and run-dir layout mirror the
reference so downstream tooling works unchanged.

Data: when the hypes' ``root_dir`` exists on disk the loop trains on the
real AirV2X dataset (directory walk + augmentor + prefetch workers +
on-device anchor labeling, mirroring tools/train.py:67-102,191-247 of the
reference); validation uses ``validate_dir``. Only when the dataset
directory is absent does the synthetic scene generator stand in, keeping
the full loop exercisable in dataset-less environments.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="airv2x_tpu training")
    p.add_argument("--hypes_yaml", type=str, required=True)
    p.add_argument("--model_dir", type=str, default="", help="resume dir")
    p.add_argument("--log_dir", type=str, default="logs")
    p.add_argument("--epochs", type=int, default=0, help="override epoches")
    p.add_argument("--steps_per_epoch", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--half", action="store_true", help="bf16 compute")
    p.add_argument(
        "--remat", action="store_true",
        help="rematerialize backbone stages in backward (less activation "
        "HBM for large per-chip batch; see doc/performance.md)",
    )
    p.add_argument(
        "--num_workers", type=int, default=4, help="prefetch workers"
    )
    p.add_argument(
        "--grad_accum", type=int, default=0,
        help="microbatches per optimizer step (sidesteps the B>=4 encoder "
        "scheduling cliff; see doc/performance.md). Default 0 = auto: "
        "microbatches of 2 whenever the per-chip batch is an even number "
        "> 2 (measured round 5: B=4 accum2 159.5 ms/step vs 319.6 plain); "
        "pass 1 to force a single full-batch step",
    )
    p.add_argument(
        "--synthetic",
        action="store_true",
        help="force synthetic data even if root_dir exists",
    )
    return p.parse_args()


def resolve_grad_accum(flag: int, batch_size: int) -> int:
    """0 (auto) -> microbatches of 2 when the per-chip batch is an even
    number > 2 (measured round 5: B=4 accum2 159.5 ms/step vs 319.6 plain,
    doc/bench_train_r05.json); any explicit value passes through."""
    if flag:
        return flag
    return batch_size // 2 if batch_size > 2 and batch_size % 2 == 0 else 1


def build_real_loaders(hypes, opt, batch_size):
    """(train_loader, val_loader|None) when root_dir exists, else None."""
    root = hypes.get("root_dir") or ""
    if opt.synthetic or not os.path.isdir(root):
        return None
    import jax

    from airv2x_tpu.data.airv2x_dataset import AirV2XDataset, WildSettings
    from airv2x_tpu.data.loader import RealDataLoader

    wild_cfg = hypes.get("wild_setting", {}) or {}
    wild = WildSettings(
        async_mode=bool(wild_cfg.get("async", False)),
        async_overhead_ms=float(wild_cfg.get("async_overhead", 100)),
        loc_error=bool(wild_cfg.get("loc_err", False)),
        xyz_std=float(wild_cfg.get("xyz_std", 0.2)),
        ryp_std=float(wild_cfg.get("ryp_std", 0.2)),
    )
    host_id, num_hosts = jax.process_index(), jax.process_count()
    train_ds = AirV2XDataset(hypes, root, train=True, wild=wild, seed=opt.seed)
    if len(train_ds) == 0:
        return None
    train_loader = RealDataLoader(
        train_ds,
        hypes,
        batch_size,
        train=True,
        seed=opt.seed,
        num_workers=opt.num_workers,
        host_id=host_id,
        num_hosts=num_hosts,
    )
    val_loader = None
    vdir = hypes.get("validate_dir") or ""
    if os.path.isdir(vdir):
        val_ds = AirV2XDataset(hypes, vdir, train=False, seed=opt.seed)
        if len(val_ds):
            val_loader = RealDataLoader(
                val_ds,
                hypes,
                batch_size,
                train=False,
                seed=opt.seed,
                num_workers=opt.num_workers,
                host_id=host_id,
                num_hosts=num_hosts,
                # static batch shape (no ragged last batch) keeps the eval
                # step a single compiled program across epochs
                drop_last=len(val_ds) >= batch_size,
            )
    return train_loader, val_loader


def synthetic_batches(hypes, layout, batch_size, steps, seed):
    """Host-side generator of anchor-labelled synthetic batches."""
    from airv2x_tpu.data.synthetic import make_batch
    from airv2x_tpu.ops.anchors import anchor_standup_boxes, generate_anchor_grid

    anchors = generate_anchor_grid(hypes["postprocess"]["anchor_args"])
    standup = anchor_standup_boxes(anchors)
    rng = np.random.default_rng(seed)
    # V2X-R lidar+radar families consume a second cloud
    core = hypes["model"]["core_method"].lower()
    needs_radar = any(k in core for k in ("l4dr", "lrf", "interf", "mdd"))
    for _ in range(steps):
        batch, _ = make_batch(
            rng,
            layout,
            batch_size=batch_size,
            anchors=anchors,
            anchor_standup=standup,
            target_args=hypes["postprocess"]["target_args"],
            num_objects=10,
            points_per_agent=int(hypes["preprocess"].get("max_points", 8192)),
            lidar_range=hypes["preprocess"]["cav_lidar_range"],
            max_boxes=hypes["postprocess"]["max_num"],
            radar_points_per_agent=(
                int(hypes["preprocess"].get("max_points", 8192)) // 8
                if needs_radar
                else 0
            ),
            # seg task: rasterized synthetic BEV labels
            seg_hw=int(hypes.get("seg_hw", 0))
            if hypes.get("task") == "seg" else 0,
            seg_res=float(hypes.get("seg_res", 0.25)),
        )
        # camera-modality configs consume per-type image stacks
        margs = hypes["model"]["args"]
        cam_types = [
            t for t in ("vehicle", "rsu", "drone")
            if isinstance(margs.get(t), dict)
            and "cam" in margs[t].get("modalities", [])
        ]
        if cam_types:
            from airv2x_tpu.data.synthetic import add_camera_inputs

            hw = tuple(
                margs[cam_types[0]]["cam"]["data_aug_conf"]["final_dim"]
            )
            cams = []
            for _b in range(batch_size):
                one = {"points": batch["points"][_b]}
                add_camera_inputs(one, layout, rng, img_hw=hw)
                cams.append(one)
            for key in cams[0]:
                if key.startswith("cam_"):
                    batch[key] = {
                        kk: np.stack([c[key][kk] for c in cams])
                        for kk in cams[0][key]
                    }
        yield batch


def main():
    opt = parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from airv2x_tpu.config import load_yaml
    from airv2x_tpu.loss import build_loss
    from airv2x_tpu.models import build_model
    from airv2x_tpu.models.base import SlotLayout
    from airv2x_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from airv2x_tpu.parallel.train import (
        create_train_state,
        make_eval_step,
        make_optimizer,
        make_train_step,
    )
    from airv2x_tpu.utils.checkpoint import (
        find_last_epoch,
        load_checkpoint,
        save_checkpoint,
        setup_train_dir,
    )

    hypes = load_yaml(opt.hypes_yaml, opt.model_dir or None)
    if opt.remat:
        hypes["model"]["args"]["remat"] = True
    tp = hypes["train_params"]
    epochs = opt.epochs or int(tp["epoches"])
    batch_size = opt.batch_size or int(tp["batch_size"])
    opt.grad_accum = resolve_grad_accum(opt.grad_accum, batch_size)
    if opt.grad_accum > 1:
        print(
            f"grad_accum -> {opt.grad_accum} (per-chip batch "
            f"{batch_size} as microbatches of 2; doc/performance.md r5)"
        )
    save_freq = int(tp.get("save_freq", 1))
    eval_freq = int(tp.get("eval_freq", 2))

    loaders = build_real_loaders(hypes, opt, batch_size)
    if loaders is not None:
        train_loader, val_loader = loaders
        steps_per_epoch = opt.steps_per_epoch or len(train_loader)
        print(
            f"real dataset: {len(train_loader.dataset)} train samples"
            + (
                f", {len(val_loader.dataset)} val samples"
                if val_loader
                else ", no validate_dir"
            )
        )
    else:
        train_loader = val_loader = None
        steps_per_epoch = opt.steps_per_epoch or int(
            tp.get("steps_per_epoch", 50)
        )
        print("dataset not on disk; training on synthetic scenes")

    model = build_model(hypes)
    layout = SlotLayout.from_args(hypes["model"]["args"])
    loss_fn = build_loss(hypes)
    tx, sched = make_optimizer(hypes, steps_per_epoch)

    mesh = make_mesh()
    n_dev = int(np.prod(list(mesh.shape.values())))
    assert batch_size % max(n_dev, 1) == 0 or n_dev == 1, (
        f"batch {batch_size} not divisible by {n_dev} devices"
    )

    # init from one example batch
    if train_loader is not None:
        example = next(train_loader.batches(epoch=0))
    else:
        example = next(
            synthetic_batches(hypes, layout, batch_size, 1, opt.seed)
        )
    example = jax.tree.map(jnp.asarray, example)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(opt.seed), "comm": jax.random.PRNGKey(1)},
        example,
    )
    state = create_train_state(model, variables, tx)

    if opt.model_dir:
        run_dir = opt.model_dir
        start_epoch = find_last_epoch(run_dir)
        if start_epoch:
            state = load_checkpoint(run_dir, start_epoch, state)
            print(f"resumed from epoch {start_epoch}")
    else:
        run_dir = setup_train_dir(hypes, opt.log_dir)
        start_epoch = 0
    print(f"run dir: {run_dir}; devices: {n_dev}; mesh {dict(mesh.shape)}")

    with mesh:
        state = jax.device_put(state, replicated(mesh))
        from airv2x_tpu.utils.compile_opts import model_compiler_options

        copts = model_compiler_options(hypes)
        train_step = make_train_step(
            model, loss_fn, tx, mesh=mesh, compiler_options=copts,
            accum_steps=opt.grad_accum,
        )
        eval_step = make_eval_step(model, loss_fn, compiler_options=copts)
        rng = jax.random.PRNGKey(opt.seed)

        for epoch in range(start_epoch, epochs):
            t0 = time.time()
            losses = []
            if train_loader is not None:
                epoch_iter = train_loader.batches(epoch=epoch)
                if opt.steps_per_epoch:
                    # honor the override (it already sized the LR schedule)
                    from itertools import islice

                    epoch_iter = islice(epoch_iter, opt.steps_per_epoch)
            else:
                epoch_iter = synthetic_batches(
                    hypes, layout, batch_size, steps_per_epoch,
                    opt.seed + epoch + 1,
                )
            for batch in epoch_iter:
                # epoch-scheduled loss terms (point_pillar_loss_mdd's
                # sigmoid_weight) read labels["epoch"]; 1-based upstream
                batch["labels"]["epoch"] = np.float32(epoch + 1)
                batch = shard_batch(mesh, jax.tree.map(jnp.asarray, batch))
                state, parts = train_step(state, batch, rng)
                losses.append(parts)
            losses = jax.tree.map(lambda *x: float(np.mean(x)), *losses)
            msg = (
                f"epoch {epoch + 1}/{epochs} "
                + " ".join(f"{k}: {v:.3f}" for k, v in sorted(losses.items()))
                + f" ({time.time() - t0:.1f}s)"
            )
            print(msg)
            with open(os.path.join(run_dir, "train_loss.txt"), "a") as f:
                f.write(msg + "\n")

            if (epoch + 1) % save_freq == 0:
                save_checkpoint(run_dir, epoch + 1, jax.device_get(state))

            if (epoch + 1) % eval_freq == 0:
                val_losses = []
                if val_loader is not None:
                    val_iter = val_loader.batches(epoch=0)
                elif train_loader is not None:
                    # no validate_dir: reuse the train split un-shuffled
                    val_iter = train_loader.batches(epoch=0)
                else:
                    val_iter = synthetic_batches(
                        hypes, layout, batch_size,
                        max(steps_per_epoch // 5, 1), 777,
                    )
                for batch in val_iter:
                    batch = shard_batch(mesh, jax.tree.map(jnp.asarray, batch))
                    _, total, _ = eval_step(state, batch)
                    val_losses.append(float(total))
                val = float(np.mean(val_losses))
                line = f"epoch: {epoch + 1}, loss: {val:.4f}"
                print("val", line)
                with open(os.path.join(run_dir, "validation_loss.txt"), "a") as f:
                    f.write(line + "\n")

    print("training finished; run dir:", run_dir)


if __name__ == "__main__":
    main()
