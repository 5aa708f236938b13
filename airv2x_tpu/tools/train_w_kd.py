"""Knowledge-distillation training (twin of tools/train_w_kd.py).

Loads a frozen teacher (train_w_kd.py:118-143 loads a pretrained DiscoNet
teacher), runs student and teacher on each batch, and feeds the KD loss
(loss.point_pillar_binary.make_disconet_loss) the pre-head feature maps of
both.

  python -m airv2x_tpu.tools.train_w_kd --hypes_yaml <student cfg> \
      --teacher_dir <teacher run dir>
"""

from __future__ import annotations

import argparse

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--hypes_yaml", required=True)
    p.add_argument("--teacher_dir", required=True)
    p.add_argument("--log_dir", default="logs")
    p.add_argument("--epochs", type=int, default=0)
    p.add_argument("--steps_per_epoch", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    opt = parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from airv2x_tpu.config import load_yaml
    from airv2x_tpu.loss import build_loss
    from airv2x_tpu.models import build_model
    from airv2x_tpu.models.base import SlotLayout
    from airv2x_tpu.parallel.train import (
        TrainState,
        create_train_state,
        make_optimizer,
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

    student = build_model(hypes)
    layout = SlotLayout.from_args(hypes["model"]["args"])
    loss_fn = build_loss(hypes)
    tx, _ = make_optimizer(hypes, steps_per_epoch)

    teacher_hypes = load_yaml(None, opt.teacher_dir)
    teacher = build_model(teacher_hypes)

    example = next(synthetic_batches(hypes, layout, batch_size, 1, opt.seed))
    example = jax.tree.map(jnp.asarray, example)
    s_vars = jax.jit(lambda r, b: student.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(opt.seed), "comm": jax.random.PRNGKey(1)},
        example,
    )
    t_vars = jax.jit(lambda r, b: teacher.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(2), "comm": jax.random.PRNGKey(3)}, example
    )
    t_tx, _ = make_optimizer(teacher_hypes)
    t_state = create_train_state(teacher, t_vars, t_tx)
    t_epoch = find_best_epoch(opt.teacher_dir)
    if t_epoch:
        t_state = load_checkpoint(opt.teacher_dir, t_epoch, jax.device_get(t_state))
        print(f"teacher epoch {t_epoch} loaded (frozen)")

    state = create_train_state(student, s_vars, tx)
    run_dir = setup_train_dir(hypes, opt.log_dir)

    @jax.jit
    def step(state: TrainState, t_params, t_stats, batch, rng):
        def compute(params):
            s_out, updates = student.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                train=True,
                rngs={"comm": rng},
                mutable=["batch_stats"],
            )
            t_out = teacher.apply(
                {"params": t_params, "batch_stats": t_stats}, batch, train=False
            )
            s_out = dict(s_out)
            # real DiscoNet KD imitates the fused BEV feature map when the
            # teacher exposes it (point_pillar_disconet_teacher); fall back
            # to psm-level distillation otherwise
            s_out.setdefault("student_feature", s_out["psm"])
            t_feat = t_out.get("teacher_feature", t_out.get("psm"))
            if t_feat.shape[-1] != s_out["student_feature"].shape[-1]:
                t_feat = t_out.get("teacher_psm", t_out.get("psm"))
                s_out["student_feature"] = s_out["psm"]
            s_out["teacher_feature"] = jax.lax.stop_gradient(t_feat)
            total, parts = loss_fn(s_out, batch["labels"])
            return total, (parts, updates["batch_stats"])

        (loss, (parts, stats)), grads = jax.value_and_grad(compute, has_aux=True)(
            state.params
        )
        upd, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, upd)
        return (
            state.replace(
                step=state.step + 1,
                params=params,
                batch_stats=stats,
                opt_state=opt_state,
            ),
            parts,
        )

    rng = jax.random.PRNGKey(opt.seed)
    for epoch in range(epochs):
        losses = []
        for batch in synthetic_batches(
            hypes, layout, batch_size, steps_per_epoch, opt.seed + epoch + 1
        ):
            batch = jax.tree.map(jnp.asarray, batch)
            state, parts = step(
                state, t_state.params, t_state.batch_stats, batch, rng
            )
            losses.append(float(parts["total_loss"]))
        print(f"epoch {epoch + 1}/{epochs} loss {np.mean(losses):.3f}")
        save_checkpoint(run_dir, epoch + 1, jax.device_get(state))
    print("KD training finished:", run_dir)


if __name__ == "__main__":
    main()
