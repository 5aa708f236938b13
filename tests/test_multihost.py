"""Multi-host (DCN-axis) data-parallel training test.

The reference trains HEAL/STAMP across 2 nodes x 1 GPU (readme.md:85-88;
opencood/tools/multi_gpu_utils.py:22-49 reads RANK/WORLD_SIZE and inits a
NCCL process group). This test runs the TPU-native analog as TWO REAL
PROCESSES: ``jax.distributed.initialize`` over a gloo-backed CPU
coordination service, 4 virtual devices per process, per-host data
preparation through ``Prefetcher.shard_indices`` (the DistributedSampler
twin), and one jitted train step on a global (data=4, model=2) mesh whose
data axis spans the two hosts. See tests/multihost_worker.py for the
worker body.
"""

import os
import re
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_data_parallel_train_step():
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    port = _free_port()
    env = dict(os.environ)
    # the worker pins its own XLA_FLAGS / platform; drop the conftest's
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    losses = []
    for out in outs:
        m = re.search(r"MULTIHOST_LOSS (\S+)", out)
        assert m, f"no loss line in worker output:\n{out}"
        losses.append(float(m.group(1)))

    # the psum'd global loss must be bit-identical on both hosts — each host
    # fed only its own index shard, so agreement proves the DCN-axis
    # collective combined them
    assert losses[0] == losses[1]
