"""Device mesh + sharding helpers (data-parallel, the reference's topology).

The reference distributes with HF Accelerate/DDP over NCCL
(train_diffute_v1.py:581-587,780-782): parameters replicated, batch split,
gradients all-reduced.  The TPU-native equivalent needs no comm code at all:
a 1-D ``Mesh(('data',))``, batch arrays sharded on axis 0, parameters
replicated — XLA inserts the gradient psum over ICI from the sharding specs
(SURVEY.md §2d).  Multi-host pods extend the same mesh via
``jax.distributed.initialize`` (call :func:`maybe_init_distributed` first).

The extra mesh axes for tp/pp are deliberately absent: the UNet (~866M
params) fits comfortably on one chip; scaling is by data (SURVEY.md §2c).
Optimizer-state sharding over the data axis (ZeRO-1) is available via
``shard_optimizer_states`` in TrainConfig.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> None:
    """Initialize multi-host JAX when launched under a pod launcher."""
    if os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(dp_size: int = -1, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if dp_size == -1:
        dp_size = len(devices)
    if dp_size > len(devices):
        raise ValueError(f"dp_size {dp_size} > available devices {len(devices)}")
    return Mesh(np.asarray(devices[:dp_size]), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def zero1_shardings(tree: Any, mesh: Mesh) -> Any:
    """ZeRO-1-style shardings for an optimizer-state pytree: each leaf is
    sharded along its first axis divisible by the data-parallel size (Adam
    moments mirror the params, so conv kernels shard on a channel dim);
    leaves with no such axis stay replicated.  XLA then keeps the optimizer
    update partitioned and all-gathers only the updated params."""
    n = mesh.devices.size

    def spec(x):
        shape = getattr(x, "shape", ())
        for i, d in enumerate(shape):
            if d % n == 0 and d >= n:
                return NamedSharding(mesh, P(*((None,) * i + ("data",))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, tree)


class DevicePrefetcher:
    """Wrap a host batch iterator and move batches onto the mesh ahead of
    time on a background thread, overlapping the host->device transfer with
    device compute (the TPU analogue of torch's pinned-memory prefetch; the
    reference relies on DataLoader workers alone, train_diffute_v1.py:757-763).

    Yields batches already placed via :func:`shard_batch`; trainers skip
    re-placement for committed device arrays.  ``depth`` bounds device-side
    buffering (each buffered batch holds HBM).
    """

    def __init__(self, iterator, mesh: Mesh, batch_axis: int = 0,
                 depth: int = 2):
        self._it = iterator
        self.mesh = mesh
        self.batch_axis = batch_axis
        self.depth = max(1, depth)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        stop = threading.Event()
        error = []  # worker exception, re-raised in the consumer

        def put_stop_aware(item):
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return
                except queue.Full:
                    continue

        def worker():
            try:
                for batch in self._it:
                    placed = shard_batch(self.mesh, batch, self.batch_axis)
                    put_stop_aware(placed)
                    if stop.is_set():
                        return
            except BaseException as e:  # surface in the consumer, never
                error.append(e)         # silently truncate training
            finally:
                put_stop_aware(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    if error:
                        raise error[0]
                    return
                yield item
        finally:
            stop.set()
            # Drain before returning control: when the consumer exits early
            # (resume-at-max-steps breaks on the first batch) the worker can
            # still be inside shard_batch's h2d transfer, and tearing the
            # process down around an in-flight transfer aborts the client
            # (`terminate called without an active exception`, observed on
            # the relay backend).  The worker checks `stop` between batches,
            # so this waits out the current unit of work — the in-flight
            # transfer, or the source iterator building its next batch —
            # bounded by the timeout if either wedges.
            t.join(timeout=60.0)


def place_global(mesh: Mesh, x: Any, spec: P) -> jax.Array:
    """Place a HOST-GLOBAL array (every process holds the identical full
    array) onto the mesh with ``spec``.

    Single-process: a plain ``device_put``.  Multi-process: ``device_put``
    cannot target non-addressable devices, so the global array is assembled
    via ``jax.make_array_from_callback`` — each process serves the shards it
    owns out of its full host copy.  This is the serving-side placement
    (replicated params, replicated-or-sharded edit inputs), as opposed to
    :func:`shard_batch` where each process holds only its LOCAL slice."""
    sh = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sh)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    """Replicate a host-global pytree (e.g. serving params) onto the mesh,
    multi-process safe (see :func:`place_global`)."""
    return jax.tree_util.tree_map(
        lambda x: place_global(mesh, x, P()), tree)


def shard_batch(mesh: Mesh, batch: Any, batch_axis: int = 0) -> Any:
    """Place a batch pytree onto the mesh, sharded along ``batch_axis``
    (axis 1 for (accum, micro, ...) layouts).

    Single-process: a plain sharded ``device_put`` of the host-global batch.
    Multi-process (pod): each process passes its PROCESS-LOCAL shard (from a
    rank-sharded :class:`~diffute_tpu.io.dataset.PrefetchLoader`) and the
    pieces are assembled into one global array via
    ``jax.make_array_from_process_local_data`` — a host-global device_put
    would be wrong there (every process would upload a full copy claiming it
    is the whole batch).
    """
    spec = P(*((None,) * batch_axis + ("data",)))
    sh = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)

    def put_local(x):
        x = np.asarray(x)
        global_shape = (x.shape[:batch_axis]
                        + (x.shape[batch_axis] * jax.process_count(),)
                        + x.shape[batch_axis + 1:])
        return jax.make_array_from_process_local_data(sh, x, global_shape)

    return jax.tree_util.tree_map(put_local, batch)
