"""Training step factory: optimizer/scheduler from hypes + pjit train step.

Replaces the reference's torch loop plumbing (tools/train.py:191-292,
train_utils.py:371-456 optimizer/scheduler factories): the whole
forward/loss/backward/update is ONE jitted SPMD program over the mesh; the
DDP gradient allreduce becomes an XLA psum inserted automatically by jit
when the batch is sharded and the params are replicated.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_lr_schedule(hypes: dict, steps_per_epoch: int):
    """Epoch-indexed schedulers of the reference (train_utils.py:429-456)."""
    opt_cfg = hypes["optimizer"]
    sched_cfg = hypes.get("lr_scheduler", {})
    base_lr = float(opt_cfg["lr"])
    method = sched_cfg.get("core_method", "constant")
    if method == "multistep":
        gamma = float(sched_cfg["gamma"])
        bounds = {
            int(e) * steps_per_epoch: gamma for e in sched_cfg["step_size"]
        }
        return optax.piecewise_constant_schedule(base_lr, bounds)
    if method == "step":
        gamma = float(sched_cfg["gamma"])
        every = int(sched_cfg["step_size"]) * steps_per_epoch
        return lambda step: base_lr * gamma ** (step // every)
    if method in ("exponential", "Exponential"):
        gamma = float(sched_cfg.get("gamma", 0.98))
        return lambda step: base_lr * gamma ** (step / steps_per_epoch)
    if method == "cosineannealwarm":
        # timm CosineLRScheduler recipe (train_utils.py:429-446): linear
        # warmup from warmup_lr then cosine decay to lr_min over the run
        num_steps = int(sched_cfg["epoches"]) * steps_per_epoch
        warmup_steps = int(sched_cfg["warmup_epoches"]) * steps_per_epoch
        return optax.warmup_cosine_decay_schedule(
            init_value=float(sched_cfg["warmup_lr"]),
            peak_value=base_lr,
            warmup_steps=max(warmup_steps, 1),
            decay_steps=max(num_steps, 2),
            end_value=float(sched_cfg["lr_min"]),
        )
    return lambda step: base_lr


def make_optimizer(hypes: dict, steps_per_epoch: int = 1):
    opt_cfg = hypes["optimizer"]
    sched = make_lr_schedule(hypes, steps_per_epoch)
    args = opt_cfg.get("args", {})
    wd = float(args.get("weight_decay", 0.0))
    eps = float(args.get("eps", 1e-8))
    method = opt_cfg.get("core_method", "Adam").lower()
    if method == "adam" and wd > 0:
        return optax.adamw(sched, eps=eps, weight_decay=wd), sched
    if method == "adam":
        return optax.adam(sched, eps=eps), sched
    if method == "sgd":
        return optax.sgd(sched, momentum=float(args.get("momentum", 0.9))), sched
    raise ValueError(f"unknown optimizer {opt_cfg['core_method']}")


def freeze_by_path(tx, params, frozen_prefixes):
    """Wrap an optax transform so params whose path starts with any of the
    given top-level module prefixes get zero updates.

    TPU equivalent of the reference's ``backbone_fix`` requires_grad freezing
    (airv2x_heal.py:71-131: bool -> freeze encoders+backbone+heads, or a
    list of agent types -> freeze those encoders only).
    """
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    labels = flax.traverse_util.unflatten_dict(
        {
            k: (
                "frozen"
                if any(
                    str(part).startswith(p)
                    for part in k
                    for p in frozen_prefixes
                )
                else "trainable"
            )
            for k in flat
        }
    )
    return optax.multi_transform(
        {"trainable": tx, "frozen": optax.set_to_zero()}, labels
    )


def backbone_fix_prefixes(args) -> list:
    """Config-driven freeze list (see airv2x_heal.backbone_fix semantics)."""
    fix = args.get("backbone_fix")
    if not fix:
        return []
    if isinstance(fix, bool):
        return ["encoder", "backbone", "shrink_conv", "heads", "seg_head"]
    # list of agent types -> freeze those per-type encoders
    return [f"{t}_pillar_vfe" for t in fix]


def create_train_state(model, variables, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )


def make_train_step(
    model,
    loss_fn: Callable,
    tx,
    mesh=None,
    donate: bool = True,
    compiler_options: dict | None = None,
    accum_steps: int = 1,
    jit: bool = True,
):
    """Build the jitted train step. With a mesh, state is replicated and the
    batch is expected sharded along 'data'; XLA inserts the gradient psum.

    ``compiler_options`` carries per-config XLA workarounds
    (utils.compile_opts.model_compiler_options).

    ``accum_steps > 1`` splits the per-chip batch into that many microbatches
    run sequentially under ``lax.scan`` with gradient accumulation and ONE
    optimizer update. This sidesteps the B>=4 encoder-graph scheduling cliff
    (doc/performance.md round 3/4): B=4 as 2 microbatches of 2 costs ~2x a
    B=2 step instead of ~5x. Semantics match running the microbatches as
    consecutive steps of the reference's B=2 recipe — BN batch statistics
    and their running updates are per-microbatch, the gradient is the mean
    over microbatches, dropout/comm rngs differ per microbatch."""

    def forward(params, stats, mb, rng):
        out, updates = model.apply(
            {"params": params, "batch_stats": stats},
            mb,
            train=True,
            rngs={
                "comm": rng,
                "diffusion": jax.random.fold_in(rng, 1),
                "dropout": jax.random.fold_in(rng, 2),
            },
            mutable=["batch_stats"],
        )
        total, parts = loss_fn(out, mb["labels"])
        return total, (parts, updates["batch_stats"])

    def step_fn(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        if accum_steps > 1:
            b = batch["points"].shape[0]
            assert b % accum_steps == 0, (
                f"batch {b} not divisible by accum_steps {accum_steps}"
            )
            mb = b // accum_steps

            def split(x):
                if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == b:
                    return x.reshape((accum_steps, mb) + x.shape[1:]), True
                return x, False

            leaves, treedef = jax.tree.flatten(batch)
            parts_flags = [split(x) for x in leaves]
            scanned = [
                x if f else None for (x, f) in parts_flags
            ]
            static = [None if f else x for (x, f) in parts_flags]

            def body(carry, xs):
                stats, grad_acc, parts_acc, k = carry
                sc = xs
                merged = [
                    s if s is not None else st
                    for s, st in zip(sc, static)
                ]
                micro = jax.tree.unflatten(treedef, merged)
                (loss, (parts, new_stats)), grads = jax.value_and_grad(
                    forward, has_aux=True
                )(state.params, stats, micro, jax.random.fold_in(rng, k))
                grad_acc = jax.tree.map(jnp.add, grad_acc, grads)
                parts_acc = jax.tree.map(jnp.add, parts_acc, parts)
                return (new_stats, grad_acc, parts_acc, k + 3), ()

            zero_g = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            first = jax.tree.unflatten(
                treedef,
                [
                    s[0] if s is not None else st
                    for s, st in zip(scanned, static)
                ],
            )
            zero_parts = jax.tree.map(
                lambda _: jnp.float32(0.0),
                jax.eval_shape(
                    lambda p: forward(p, state.batch_stats, first, rng)[1][0],
                    state.params,
                ),
            )
            # None leaves are empty pytree nodes, so scan slices only the
            # batch-led arrays and body sees Nones at the static positions
            (new_stats, grads, parts, _), _ = jax.lax.scan(
                body,
                (state.batch_stats, zero_g, zero_parts, jnp.int32(0)),
                scanned,
            )
            inv = 1.0 / accum_steps
            grads = jax.tree.map(lambda g: g * inv, grads)
            parts = jax.tree.map(lambda p: p * inv, parts)
        else:
            (loss, (parts, new_stats)), grads = jax.value_and_grad(
                forward, has_aux=True
            )(state.params, state.batch_stats, batch, rng)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        return new_state, parts

    # jit propagates shardings from the operands: state replicated, batch
    # sharded along 'data' (see parallel.mesh.shard_batch). The gradient
    # reduction across data shards compiles to an ICI psum.
    if not jit:
        # raw step for callers that fold K steps into one program
        # (tools/bench_train.py wraps it in a lax.scan for honest timing
        # through the axon tunnel — see the verify skill)
        return step_fn
    return jax.jit(
        step_fn,
        donate_argnums=(0,) if donate else (),
        compiler_options=compiler_options,
    )


def make_eval_step(model, loss_fn, compiler_options: dict | None = None):
    def eval_fn(state: TrainState, batch):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch,
            train=False,
        )
        total, parts = loss_fn(out, batch["labels"])
        return out, total, parts

    return jax.jit(eval_fn, compiler_options=compiler_options)
