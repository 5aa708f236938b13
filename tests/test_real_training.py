"""Real-data training path: on-disk dataset -> RealDataLoader -> train step.

Covers VERDICT round-1 item 1: the loop the reference drives through torch
DataLoader workers (tools/train.py:67-102,191-247) runs here off the disk
fixture with augmentation, prefetch workers, anchor labeling, and a
decreasing loss over epochs.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airv2x_tpu.config import load_yaml
from airv2x_tpu.data.airv2x_dataset import AirV2XDataset
from airv2x_tpu.data.loader import RealDataLoader
from airv2x_tpu.loss import build_loss
from airv2x_tpu.models import build_model
from airv2x_tpu.parallel.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)
from tests.fixture_utils import make_fixture

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("airv2x_data")
    return make_fixture(str(root), n_timestamps=4)


def _tiny_hypes():
    hypes = load_yaml(os.path.join(REPO, "hypes_yaml/test/tiny_where2comm.yaml"))
    hypes["preprocess"]["max_points"] = 1024
    return hypes


def test_loader_batches_contract(fixture_root):
    hypes = _tiny_hypes()
    ds = AirV2XDataset(hypes, fixture_root, train=True)
    loader = RealDataLoader(ds, hypes, batch_size=2, train=True, num_workers=2)
    assert len(ds) == 4 and len(loader) == 2

    batches = list(loader.batches(epoch=0))
    assert len(batches) == 2
    b = batches[0]
    L = ds.layout.total
    assert b["points"].shape == (2, L, 1024, 4)
    assert set(b["labels"]) >= {
        "pos_equal_one", "neg_equal_one", "targets", "class_ids",
    }
    # the in-range fixture object must produce at least one positive anchor
    assert b["labels"]["pos_equal_one"].sum() > 0

    # epoch shuffling: different epoch -> different sample order
    i0 = loader.epoch_indices(0)
    i1 = loader.epoch_indices(1)
    assert sorted(i0) == sorted(i1) == list(range(4))
    assert i0 != i1 or len(i0) <= 1

    # host sharding splits indices disjointly
    l0 = RealDataLoader(ds, hypes, 1, host_id=0, num_hosts=2)
    l1 = RealDataLoader(ds, hypes, 1, host_id=1, num_hosts=2)
    s0, s1 = set(l0.epoch_indices(3)), set(l1.epoch_indices(3))
    assert s0.isdisjoint(s1) and len(s0 | s1) == 4


def test_augmentation_applied_when_enabled(fixture_root):
    hypes = _tiny_hypes()
    hypes["train_params"]["augment"] = True
    hypes["data_augment"] = [
        {"NAME": "random_world_rotation", "WORLD_ROT_ANGLE": [0.5, 0.5]}
    ]
    ds = AirV2XDataset(hypes, fixture_root, train=True)
    aug = RealDataLoader(ds, hypes, batch_size=1, train=True, num_workers=1)
    hypes2 = _tiny_hypes()
    plain = RealDataLoader(
        AirV2XDataset(hypes2, fixture_root, train=True),
        hypes2, batch_size=1, train=True, num_workers=1,
    )
    (ba, ga) = next(aug.batches(epoch=0, with_gt=True))
    (bp, gp) = next(plain.batches(epoch=0, with_gt=True))
    # same sample order (same seed) but rotated boxes/points
    assert not np.allclose(ga["boxes"][ga["mask"]], gp["boxes"][gp["mask"]])
    # rotation preserves box size
    np.testing.assert_allclose(
        ga["boxes"][ga["mask"]][:, 3:6], gp["boxes"][gp["mask"]][:, 3:6],
        atol=1e-5,
    )


def test_real_data_training_decreases_loss(fixture_root):
    hypes = _tiny_hypes()
    ds = AirV2XDataset(hypes, fixture_root, train=True)
    loader = RealDataLoader(ds, hypes, batch_size=2, train=True, num_workers=2)

    model = build_model(hypes)
    loss_fn = build_loss(hypes)
    tx, _ = make_optimizer(hypes, steps_per_epoch=len(loader))
    example = jax.tree.map(jnp.asarray, next(loader.batches(epoch=0)))
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.PRNGKey(0), "comm": jax.random.PRNGKey(1)},
        example,
    )
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, loss_fn, tx, donate=False)
    rng = jax.random.PRNGKey(0)

    epoch_losses = []
    for epoch in range(4):
        totals = []
        for batch in loader.batches(epoch=epoch):
            state, parts = step(state, jax.tree.map(jnp.asarray, batch), rng)
            totals.append(float(parts["total_loss"]))
        epoch_losses.append(np.mean(totals))
    assert epoch_losses[-1] < epoch_losses[0], epoch_losses
