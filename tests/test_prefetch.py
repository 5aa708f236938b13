import time

import numpy as np

from airv2x_tpu.data.prefetch import Prefetcher


def test_prefetch_order_and_completeness():
    def make(idx):
        time.sleep(0.001 * (idx % 3))
        return idx * 10

    pf = Prefetcher(make, range(20), num_workers=3, buffer_size=4)
    assert list(pf) == [i * 10 for i in range(20)]


def test_prefetch_overlaps_work():
    def make(idx):
        time.sleep(0.05)
        return idx

    t0 = time.perf_counter()
    list(Prefetcher(make, range(8), num_workers=4, buffer_size=8))
    elapsed = time.perf_counter() - t0
    # 8 x 50ms serial = 0.4s; 4 workers should cut it roughly in half+
    assert elapsed < 0.35, elapsed


def test_shard_indices_partition():
    a = Prefetcher.shard_indices(10, 0, 2, seed=1)
    b = Prefetcher.shard_indices(10, 1, 2, seed=1)
    assert sorted(a + b) == list(range(10))
    assert not set(a) & set(b)
