"""Multi-process jax.distributed tests on the CPU backend (2 real processes).

Three surfaces, each the TPU-pod analogue of a reference behavior
(multihost_worker.py documents the mapping):

- data: disjoint PrefetchLoader shards -> global batch -> jitted reduction
  (DDP + DistributedSampler, train_diffute_v1.py:581-587,757-763)
- ckpt: orbax save + `latest` resume of sharded state across processes
  (accelerator save_state/load_state, train_diffute_v1.py:829-851,941-945)
- edit: edit_batch/edit_stream on a pod mesh with a batch NOT divisible by
  the mesh — the _place_inputs replication fallback must assemble global
  arrays (device_put cannot target non-addressable devices)
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(mode: str, extra_args=(), timeout=150, nprocs=2):
    coord = f"127.0.0.1:{_free_port()}"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multihost_worker.py")
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("XLA_FLAGS", None)  # 1 local device per process
    procs = [subprocess.Popen(
                 [sys.executable, worker, coord, str(rank), str(nprocs),
                  mode, *map(str, extra_args)],
                 cwd=root, env=env, stdout=subprocess.PIPE,
                 stderr=subprocess.STDOUT, text=True)
             for rank in range(nprocs)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert (f"MULTIHOST_OK mode={mode} rank={rank} devices={nprocs}"
                in out), out
    return outs


def test_two_process_distributed_data_path():
    outs = _run_workers("data")
    for out in outs:
        # disjoint shards covering all 16 examples: 2 global batches of 8,
        # global sum over the epoch = sum(range(16)) = 120 on every process
        assert "count=16 total=120.0" in out, out


def test_two_process_checkpoint_save_and_latest_resume(tmp_path):
    outs = _run_workers("ckpt", extra_args=[str(tmp_path / "ckpts")])
    for out in outs:
        # `latest` resolved to checkpoint-3 and every addressable shard of
        # the data-sharded state round-tripped on both processes
        assert "resume_step=3 shards_checked=" in out, out


@pytest.mark.slow
def test_two_process_edit_batch_not_divisible_by_mesh():
    outs = _run_workers("edit", timeout=420)
    checks = set()
    for out in outs:
        assert "batch=3 mesh=2" in out, out
        checks.add(out.split("checksum=")[1].split()[0])
    # SPMD serving: both processes computed the identical result
    assert len(checks) == 1, checks
