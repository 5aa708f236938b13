"""Device mesh + sharding helpers.

The reference scales with torch DDP over NCCL (tools/multi_gpu_utils.py:22-49,
one process per GPU, gradient allreduce inside DDP). The TPU-native
equivalent: one ``jax.sharding.Mesh`` over all chips, batch sharded along the
``data`` axis, parameters replicated (optionally sharded along ``model``),
and XLA inserting the gradient psums over ICI/DCN during jit.

Multi-host: ``jax.distributed.initialize()`` before mesh creation gives the
same program a global device view (replaces init_process_group + torchrun).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, model_axis: int = 1) -> Mesh:
    """Mesh over all (or given) devices: ('data', 'model').

    ``model_axis`` > 1 reserves that many devices for a model/tensor axis;
    the rest go to data parallelism.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_axis == 0, (n, model_axis)
    arr = np.array(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch pytree with the batch axis sharded on 'data';
    rank-0 leaves (e.g. the loss epoch scalar) are replicated."""
    sh = batch_sharding(mesh)
    rep = replicated(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, sh if np.ndim(x) else rep), batch
    )
