"""Worker for the 2-process jax.distributed smoke test (test_multihost.py).

Each process: initialize distributed CPU JAX, build the global data mesh,
draw its rank's disjoint epoch shard via PrefetchLoader, assemble the global
batch with shard_batch (make_array_from_process_local_data), and run one
jitted global-mean reduction.  Prints a checkable line per process.

Run (from test): python tests/multihost_worker.py <coord_addr> <rank> <nprocs>
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    coord, rank, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nprocs, process_id=rank)
    assert jax.process_count() == nprocs
    n_local = jax.local_device_count()
    n_global = jax.device_count()
    assert n_global == nprocs * n_local

    import numpy as np

    sys.path.insert(0, ".")
    from diffute_tpu.io.dataset import PrefetchLoader
    from diffute_tpu.parallel import make_mesh, shard_batch

    n, per_proc_batch = 16, 4
    ds = [{"i": np.asarray([float(i)])} for i in range(n)]
    loader = PrefetchLoader(
        ds, per_proc_batch,
        collate=lambda ex: {"i": np.stack([e["i"] for e in ex])},
        num_threads=1, shuffle="epoch", num_epochs=1,
        process_index=jax.process_index(), process_count=nprocs)

    mesh = make_mesh()
    local_batches = list(loader)
    assert len(local_batches) == n // nprocs // per_proc_batch

    total = 0.0
    count = 0
    for local in local_batches:
        g = shard_batch(mesh, local)
        assert g["i"].shape[0] == per_proc_batch * nprocs  # global batch

        @jax.jit
        def global_sum(b):
            return jax.numpy.sum(b["i"])

        total += float(global_sum(g))
        count += g["i"].shape[0]
    # Every index 0..15 is drawn exactly once across both processes per
    # epoch, so the global sum over the epoch is sum(range(16)) = 120.
    print(f"MULTIHOST_OK rank={rank} devices={n_global} "
          f"count={count} total={total}", flush=True)


if __name__ == "__main__":
    main()
