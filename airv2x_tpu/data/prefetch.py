"""Background-thread batch prefetcher (torch DataLoader replacement).

The reference feeds the GPU with a torch DataLoader worker pool +
DistributedSampler (tools/train.py:54-102). The TPU-side equivalent keeps a
bounded queue of host-prepared batches filled by worker threads so device
steps never wait on IO; per-host sharding for multi-host data parallelism
is an index stride, matching DistributedSampler semantics.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator


class _WorkerError:
    """Exception captured in a worker, re-raised at the consumer."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class Prefetcher:
    """Iterate ``make_batch(idx)`` over ``indices`` with bounded lookahead."""

    def __init__(
        self,
        make_batch: Callable[[int], object],
        indices,
        num_workers: int = 2,
        buffer_size: int = 4,
    ):
        self.make_batch = make_batch
        self.indices = list(indices)
        self.buffer_size = max(1, buffer_size)
        self.num_workers = max(1, num_workers)

    @staticmethod
    def shard_indices(n: int, host_id: int, num_hosts: int, seed: int = 0):
        """DistributedSampler-style per-host index shard."""
        import numpy as np

        order = np.random.default_rng(seed).permutation(n)
        return order[host_id::num_hosts].tolist()

    def __iter__(self) -> Iterator:
        work: queue.Queue = queue.Queue()
        for pos, idx in enumerate(self.indices):
            work.put((pos, idx))
        out: dict = {}
        cond = threading.Condition()
        slots = threading.Semaphore(self.buffer_size)  # bounds lookahead
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                if not slots.acquire(timeout=0.5):
                    continue
                try:
                    pos, idx = work.get_nowait()
                except queue.Empty:
                    slots.release()
                    return
                try:
                    batch = self.make_batch(idx)
                except BaseException as e:  # propagate to the consumer:
                    # a corrupt sample must fail the epoch loudly, not hang
                    # the pos-ordered wait below forever
                    batch = _WorkerError(e)
                with cond:
                    out[pos] = batch
                    cond.notify_all()

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()
        try:
            for pos in range(len(self.indices)):
                with cond:
                    while pos not in out:
                        cond.wait(timeout=120.0)
                        if pos not in out and not any(
                            t.is_alive() for t in threads
                        ) and work.empty():
                            raise RuntimeError("prefetch workers died")
                    batch = out.pop(pos)
                slots.release()
                if isinstance(batch, _WorkerError):
                    raise RuntimeError(
                        "prefetch worker failed while preparing a batch"
                    ) from batch.exc
                yield batch
        finally:
            stop.set()
