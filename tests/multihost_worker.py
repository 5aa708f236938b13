"""Worker process for the 2-host data-parallel training test.

Mirrors the reference's 2-node HEAL/STAMP recipe (readme.md:85-88 runs
torchrun across two machines; opencood/tools/multi_gpu_utils.py:22-49 reads
RANK/WORLD_SIZE and inits a NCCL process group; a DistributedSampler then
gives each rank an index stride). The TPU-native analog exercised here:

  * ``jax.distributed.initialize`` (SURVEY.md §2.2/§5) over a gloo-backed
    CPU coordination service — 2 processes x 4 local virtual devices,
  * ``Prefetcher.shard_indices`` (data/prefetch.py) as the
    DistributedSampler twin: each host prepares only its own scenes,
  * a global (data=4, model=2) mesh whose data axis SPANS the two
    processes (the DCN axis) while the spatial model axis stays
    process-local (the ICI axis) — the scaling-book layout,
  * ``jax.make_array_from_process_local_data`` to lift per-host batches
    into one global array, then ONE jitted train step.

Run: python multihost_worker.py <process_id> <coordinator_port>
Prints "MULTIHOST_LOSS <value>" — the psum'd global loss, which must be
bit-identical on both processes (asserted by tests/test_multihost.py).
"""

import os
import sys


def main() -> None:
    pid = int(sys.argv[1])
    port = int(sys.argv[2])
    # port 0 = single-process CONTROL: same graph and global batch on one
    # process owning all 8 virtual devices (no jax.distributed) — the
    # baseline the 2-process DCN timing is compared against
    single = port == 0
    world = 1 if single else 2
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={8 if single else 4}"
    )

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    # this host has ONE cpu core and both processes compile the train step
    # simultaneously — skip the expensive HLO passes (the test asserts
    # cross-host loss agreement, not speed) and share the persistent cache
    jax.config.update("jax_disable_most_optimizations", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    if not single:
        jax.distributed.initialize(
            f"localhost:{port}", num_processes=2, process_id=pid
        )
        assert jax.process_count() == 2
        assert jax.local_device_count() == 4
    assert jax.device_count() == 8

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from airv2x_tpu.config import load_yaml
    from airv2x_tpu.data.prefetch import Prefetcher
    from airv2x_tpu.data.synthetic import make_batch
    from airv2x_tpu.loss import build_loss
    from airv2x_tpu.models import build_model
    from airv2x_tpu.models.base import SlotLayout
    from airv2x_tpu.ops.anchors import anchor_standup_boxes, generate_anchor_grid
    from airv2x_tpu.parallel.mesh import make_mesh, replicated
    from airv2x_tpu.parallel.shardings import spatial_sharding
    from airv2x_tpu.parallel.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hypes = load_yaml(
        os.path.join(repo, "hypes_yaml/test/tiny_where2comm.yaml")
    )
    model = build_model(hypes)
    layout = SlotLayout.from_args(hypes["model"]["args"])
    anchors = generate_anchor_grid(hypes["postprocess"]["anchor_args"])
    standup = anchor_standup_boxes(anchors)

    def make_scene(idx: int) -> dict:
        # deterministic per global index: both hosts agree on scene content
        batch, _ = make_batch(
            np.random.default_rng(1000 + idx),
            layout,
            batch_size=1,
            anchors=anchors,
            anchor_standup=standup,
            target_args=hypes["postprocess"]["target_args"],
            num_objects=4,
            points_per_agent=256,
            lidar_range=hypes["preprocess"]["cav_lidar_range"],
            max_boxes=hypes["postprocess"]["max_num"],
            pts_per_box=30,
        )
        return {k: v[0] for k, v in batch.items() if k != "labels"} | {
            "labels": {k: v[0] for k, v in batch["labels"].items()}
        }

    # DistributedSampler twin: each host prepares ONLY its index shard,
    # through the prefetch worker pool (world_size = 2)
    global_n = 4
    my_indices = Prefetcher.shard_indices(
        global_n, 0 if single else pid, world, seed=7
    )
    scenes = list(Prefetcher(make_scene, my_indices, num_workers=2))
    assert len(scenes) == global_n // world
    local = {}
    for k in scenes[0]:
        if k == "labels":
            local[k] = {
                kk: np.stack([s[k][kk] for s in scenes]) for kk in scenes[0][k]
            }
        else:
            local[k] = np.stack([s[k] for s in scenes])

    devices = jax.devices()
    mesh = make_mesh(devices, model_axis=2)  # data=4 spans hosts

    def to_global(x):
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data")),
            np.asarray(x),
            (global_n,) + x.shape[1:],
        )

    batch = jax.tree.map(to_global, local)

    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)},
        jax.tree.map(lambda x: x[:1], local),
    )
    loss_fn = build_loss(hypes)
    tx, _ = make_optimizer(hypes, steps_per_epoch=10)
    state = create_train_state(model, variables, tx)

    with mesh, spatial_sharding(mesh):
        state = jax.device_put(state, replicated(mesh))
        step = make_train_step(model, loss_fn, tx, mesh=mesh, donate=False)
        new_state, parts = step(state, batch, jax.random.PRNGKey(7))
        jax.block_until_ready(new_state)

    total = float(parts["total_loss"])
    assert np.isfinite(total)
    assert int(new_state.step) == 1
    print(f"MULTIHOST_LOSS {total!r}", flush=True)

    # optional DCN-overhead timing (VERDICT r4 item 9): time K further
    # steps of the SAME compiled program. Compared by the test against the
    # single-process 8-device control to report the per-step cost of
    # spanning the data axis across two gloo-coordinated processes.
    k = int(os.environ.get("MULTIHOST_TIME_STEPS", "0"))
    if k:
        import time

        with mesh, spatial_sharding(mesh):
            t0 = time.perf_counter()
            for i in range(k):
                new_state, parts = step(
                    new_state, batch, jax.random.PRNGKey(8 + i)
                )
            jax.block_until_ready(new_state)
        ms = (time.perf_counter() - t0) / k * 1e3
        print(f"MULTIHOST_STEP_MS {ms:.2f}", flush=True)
    if not single:
        jax.distributed.shutdown()


if __name__ == "__main__":
    main()
