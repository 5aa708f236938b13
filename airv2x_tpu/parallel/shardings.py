"""Sharding constraints for model-parallel axes.

The workload's natural second mesh axis (beyond data parallelism) is
SPATIAL: BEV maps are (.., H, W, C) with H*W up to 140k cells — sharding H
across the ``model`` mesh axis splits every conv/attention over chips, with
XLA's SPMD partitioner inserting the halo exchanges (the
sequence-parallelism analog for this perception stack, SURVEY.md §5).

Models call :func:`shard_spatial` on their big BEV activations; it is a
no-op unless :func:`enable_spatial_sharding` installed a mesh whose
``model`` axis is larger than 1 (so single-chip runs and tests never pay
for it).
"""

from __future__ import annotations

import contextlib

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

_ACTIVE_MESH = None


def enable_spatial_sharding(mesh):
    """Install the mesh used by subsequent shard_spatial calls (or None)."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


@contextlib.contextmanager
def spatial_sharding(mesh):
    enable_spatial_sharding(mesh)
    try:
        yield
    finally:
        enable_spatial_sharding(None)


def shard_spatial(x, h_axis: int = -3):
    """Constrain the H dimension of (..., H, W, C) onto the 'model' axis."""
    mesh = _ACTIVE_MESH
    if mesh is None or mesh.shape.get("model", 1) <= 1:
        return x
    spec = [None] * x.ndim
    spec[h_axis % x.ndim] = "model"
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec))
    )
