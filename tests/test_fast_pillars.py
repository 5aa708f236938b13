"""FastPillarBEV (sort-free encoder) parity with the classic pillar path."""

import jax
import jax.numpy as jnp
import numpy as np

from airv2x_tpu.models.pillar_vfe import PillarVFE
from airv2x_tpu.ops.fast_pillars import FastPillarBEV, point_cell_ids
from airv2x_tpu.ops.scatter import scatter_pillars_to_bev
from airv2x_tpu.ops.voxelize import pillarize

LR = [-8.0, -8.0, -3.0, 8.0, 8.0, 1.0]
VS = [0.8, 0.8, 4.0]
NX = NY = 20


def _points(rng, n=600):
    pts = rng.uniform(-9, 9, (n, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-3.5, 1.5, n)
    mask = rng.uniform(size=n) > 0.1
    return jnp.asarray(pts), jnp.asarray(mask)


def test_point_cell_ids_range():
    rng = np.random.default_rng(0)
    pts, mask = _points(rng)
    ids, valid = point_cell_ids(pts, mask, LR, VS, NX, NY)
    assert ids.shape == mask.shape
    assert int(ids.max()) < NX * NY and int(ids.min()) >= 0
    # out-of-range points invalidated
    oob = (np.abs(np.asarray(pts[:, 0])) > 8) | (np.abs(np.asarray(pts[:, 1])) > 8)
    assert not np.any(np.asarray(valid) & oob)


def test_fast_pillar_parity_with_classic():
    """With caps large enough to not truncate, the fast path reproduces
    pillarize + PillarVFE + scatter exactly (eval mode)."""
    rng = np.random.default_rng(1)
    pts, mask = _points(rng)

    fast = FastPillarBEV(num_filters=[16], voxel_size=VS, lidar_range=LR)
    fv = fast.init(jax.random.PRNGKey(0), pts, mask, train=False)

    classic = PillarVFE(num_filters=[16], voxel_size=VS, lidar_range=LR)
    cv = {
        "params": {"PFNLayer_0": {
            "Dense_0": fv["params"]["Dense_0"],
            "MaskedBatchNorm_0": fv["params"]["MaskedBatchNorm_0"],
        }},
        "batch_stats": {"PFNLayer_0": {
            "MaskedBatchNorm_0": fv["batch_stats"]["MaskedBatchNorm_0"],
        }},
    }

    pil = pillarize(
        pts, mask,
        lidar_range=jnp.asarray(LR, jnp.float32),
        voxel_size=jnp.asarray(VS, jnp.float32),
        grid_size=(NX, NY, 1),
        max_pillars=NX * NY,
        max_points_per_pillar=600,  # no truncation
    )
    pf = classic.apply(cv, pil.voxels, pil.num_points, pil.coords, pil.mask,
                       train=False)
    bev_classic = scatter_pillars_to_bev(pf, pil.coords, pil.mask, ny=NY, nx=NX)

    bev_fast = fast.apply(fv, pts, mask, train=False)
    np.testing.assert_allclose(
        np.asarray(bev_fast), np.asarray(bev_classic), rtol=2e-5, atol=2e-5
    )
    assert float(jnp.abs(bev_fast).max()) > 0


def test_fast_pillar_multi_layer_rejected():
    fast = FastPillarBEV(num_filters=[16, 32], voxel_size=VS, lidar_range=LR)
    rng = np.random.default_rng(2)
    pts, mask = _points(rng, 50)
    try:
        fast.init(jax.random.PRNGKey(0), pts, mask)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "single-PFN-layer" in str(e)


def test_fast_pillar_empty_cloud():
    fast = FastPillarBEV(num_filters=[8], voxel_size=VS, lidar_range=LR)
    pts = jnp.zeros((32, 4))
    mask = jnp.zeros((32,), bool)
    v = fast.init(jax.random.PRNGKey(0), pts, mask)
    out = fast.apply(v, pts, mask, train=False)
    assert float(jnp.abs(out).max()) == 0.0


def test_fused_pillar_reduce_matches_xla_reference():
    """Pallas kernel (interpret mode on CPU) == its XLA twin."""
    from airv2x_tpu.ops.pallas_pillars import (
        FEAT, LANES, NEG, fused_pillar_reduce, reference_pillar_reduce,
    )

    rng = np.random.default_rng(3)
    m, n, cells = 3, 137, 50  # n deliberately not a multiple of the unroll
    ids = rng.integers(0, cells + 1, (m, n)).astype(np.int32)  # incl. dump
    vals = rng.normal(size=(m, n, LANES)).astype(np.float32)
    vals[..., :FEAT] = np.where(
        rng.uniform(size=(m, n, 1)) > 0.2, vals[..., :FEAT], NEG
    )
    out = fused_pillar_reduce(
        jnp.asarray(ids), jnp.asarray(vals), cells=cells, interpret=True
    )
    ref = reference_pillar_reduce(jnp.asarray(ids), jnp.asarray(vals),
                                  cells=cells)
    np.testing.assert_allclose(
        np.asarray(out)[:, :cells], np.asarray(ref)[:, :cells],
        rtol=1e-6, atol=1e-5,
    )


def test_fused_encode_row_index_at_nx_multiples(monkeypatch):
    """Flagship-width grid (nx=704): cells whose flat id is an exact
    multiple of nx exercise the in-kernel iy = rf // nx reciprocal multiply
    (a plain floor(rf/nx) mis-rounds there — 0.38 max grid error on chip)."""
    lr = [-140.8, -0.6, -3.0, 140.8, 0.6, 1.0]  # nx=704, ny=3
    nx, ny = 704, 3
    rng = np.random.default_rng(7)
    n = 512
    pts = np.stack([
        rng.uniform(lr[0], lr[3], n),
        rng.uniform(lr[1], lr[4], n),
        rng.uniform(lr[2], lr[5], n),
        rng.uniform(0, 1, n),
    ], axis=-1).astype(np.float32)
    # pin points into left-edge cells (ids 0, nx, 2*nx) and right edges
    for i, (x, y) in enumerate([(-140.7, -0.5), (-140.7, 0.0),
                                (-140.7, 0.5), (140.7, 0.5)]):
        pts[i, 0], pts[i, 1] = x, y
    mask = np.ones(n, bool)
    pts_j, mask_j = jnp.asarray(pts), jnp.asarray(mask)

    fast = FastPillarBEV(num_filters=[16], voxel_size=[0.4, 0.4, 4.0],
                         lidar_range=lr)
    fv = fast.init(jax.random.PRNGKey(0), pts_j, mask_j, train=False)
    monkeypatch.setenv("AIRV2X_PILLAR_KERNEL", "xla")
    bev_xla = fast.apply(fv, pts_j, mask_j, train=False)
    monkeypatch.setenv("AIRV2X_PILLAR_KERNEL", "pallas")
    bev_pl = fast.apply(fv, pts_j, mask_j, train=False)
    np.testing.assert_allclose(
        np.asarray(bev_pl), np.asarray(bev_xla), rtol=1e-5, atol=1e-5
    )


def test_fast_pillar_pallas_path_matches_xla(monkeypatch):
    """FastPillarBEV eval with the fused Pallas reduce (interpret mode)
    equals the two-op XLA path bit-for-bit at f32."""
    rng = np.random.default_rng(4)
    pts, mask = _points(rng)
    pts2 = jnp.stack([pts, pts[::-1]])  # (2, N, 4) leading map axis
    mask2 = jnp.stack([mask, mask[::-1]])

    fast = FastPillarBEV(num_filters=[16], voxel_size=VS, lidar_range=LR)
    fv = fast.init(jax.random.PRNGKey(0), pts2, mask2, train=False)

    monkeypatch.setenv("AIRV2X_PILLAR_KERNEL", "xla")
    bev_xla = fast.apply(fv, pts2, mask2, train=False)
    monkeypatch.setenv("AIRV2X_PILLAR_KERNEL", "pallas")
    bev_pl = fast.apply(fv, pts2, mask2, train=False)
    np.testing.assert_allclose(
        np.asarray(bev_pl), np.asarray(bev_xla), rtol=1e-5, atol=1e-5
    )
    assert float(jnp.abs(bev_pl).max()) > 0
