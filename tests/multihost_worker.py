"""Worker for the multi-process jax.distributed tests (test_multihost.py).

Modes (argv[4], default "data"):

data  Each process draws its rank's disjoint epoch shard via PrefetchLoader,
      assembles the global batch with shard_batch
      (make_array_from_process_local_data), and runs one jitted global-mean
      reduction — the multi-host analogue of the reference's DDP +
      DistributedSampler data path (train_diffute_v1.py:581-587,757-763).

ckpt  Orbax checkpoint save + `latest` resume across processes: build a
      data-sharded global state, save checkpoint-1 then checkpoint-3 from
      ALL processes (orbax coordinates through the distributed runtime),
      resolve `latest`, restore into a like-sharded target, and verify every
      locally-addressable shard round-tripped — the multi-host analogue of
      accelerator.save_state/load_state (train_diffute_v1.py:829-851,941-945).

edit  Serving on a pod mesh: DiffUTEPipeline over the 2-device global mesh
      with a batch of THREE edits — NOT divisible by the mesh — exercising
      the _place_inputs replication fallback (pipeline/edit.py), which on a
      multi-process mesh must assemble global arrays instead of device_put
      (non-addressable devices).  edit_stream must be bit-identical to
      edit_batch.

Run (from test): python tests/multihost_worker.py <coord> <rank> <nprocs> [mode] [dir]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")


def run_data(nprocs: int) -> str:
    import numpy as np

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
    return f"count={count} total={total}"


def run_ckpt(workdir: str) -> str:
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from diffute_tpu.parallel import make_mesh, place_global
    from diffute_tpu.train.checkpoint import (
        checkpoint_step,
        resolve_resume,
        restore_checkpoint,
        save_checkpoint,
    )

    mesh = make_mesh()
    n_dev = mesh.devices.size
    w = np.arange(8 * n_dev * 4, dtype=np.float32).reshape(8 * n_dev, 4)
    state = {"w": place_global(mesh, w, P("data")),
             "step": place_global(mesh, np.int32(3), P())}

    # two saves -> `latest` must pick the higher step; every process calls
    # save (orbax coordinates who writes what)
    save_checkpoint(workdir, 1, state)
    save_checkpoint(workdir, 3, state)

    resume = resolve_resume(workdir, "latest")
    assert resume is not None and checkpoint_step(resume) == 3, resume

    target = {"w": place_global(mesh, np.zeros_like(w), P("data")),
              "step": place_global(mesh, np.int32(0), P())}
    restored = restore_checkpoint(resume, target)

    # verify the shards THIS process can see round-tripped exactly
    checked = 0
    for shard in restored["w"].addressable_shards:
        np.testing.assert_array_equal(np.asarray(shard.data), w[shard.index])
        checked += 1
    assert checked > 0
    assert int(jax.device_get(restored["step"])) == 3
    return f"resume_step=3 shards_checked={checked}"


def run_edit(nprocs: int) -> str:
    import numpy as np

    import jax.numpy as jnp
    from diffute_tpu.config import tiny_test_config
    from diffute_tpu.models import AutoencoderKL, TrOCREncoder, UNet2DCondition
    from diffute_tpu.parallel import make_mesh
    from diffute_tpu.pipeline import DiffUTEPipeline

    cfg = tiny_test_config()
    vae = AutoencoderKL(cfg.vae)
    unet = UNet2DCondition(cfg.unet)
    trocr = TrOCREncoder(cfg.trocr)
    res = cfg.edit.resolution
    lat = res // cfg.vae.scale_factor
    # identical deterministic init on every process = replicated-weights SPMD
    params = {
        "vae": vae.init(jax.random.PRNGKey(0), jnp.zeros((1, res, res, 3)),
                        jax.random.PRNGKey(1))["params"],
        "unet": unet.init(
            jax.random.PRNGKey(2), jnp.zeros((1, lat, lat, 9)), jnp.array(0),
            jnp.zeros((1, cfg.trocr.seq_len,
                       cfg.trocr.hidden_size)))["params"],
        "trocr": trocr.init(
            jax.random.PRNGKey(3),
            jnp.zeros((1, cfg.trocr.image_size,
                       cfg.trocr.image_size, 3)))["params"],
    }
    mesh = make_mesh()
    pipe = DiffUTEPipeline(cfg, params, mesh=mesh)

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (120, 160, 3), np.uint8)
    box = (40, 50, 100, 70)
    items = [(img, box, t) for t in ("one", "two", "three")]  # 3 % 2 != 0

    outs = pipe.edit_batch(items, num_inference_steps=2, seed=0)
    assert len(outs) == 3
    for out in outs:
        changed = (out != img).any(axis=-1)
        ys, xs = np.where(changed)
        assert len(ys) and xs.min() >= box[0] and xs.max() < box[2]

    # streaming submits batch-1 programs (1 % mesh != 0 -> replicated too);
    # bit-identical to sequential edit() — NOT to edit_batch, whose single
    # batch-3 prep draws different noise than three batch-1 preps
    streamed = list(pipe.edit_stream(items, num_inference_steps=2, seed=0))
    for item, st in zip(items, streamed):
        seq, _ = pipe.edit(item[0], item[1], item[2],
                           num_inference_steps=2, seed=0)
        np.testing.assert_array_equal(st, seq)

    checksum = int(sum(int(o.astype(np.int64).sum()) for o in outs)
                   + sum(int(o.astype(np.int64).sum()) for o in streamed))
    return f"batch=3 mesh={mesh.devices.size} checksum={checksum}"


def main() -> None:
    coord, rank, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "data"
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nprocs, process_id=rank)
    assert jax.process_count() == nprocs
    n_local = jax.local_device_count()
    n_global = jax.device_count()
    assert n_global == nprocs * n_local

    sys.path.insert(0, ".")
    if mode == "data":
        detail = run_data(nprocs)
    elif mode == "ckpt":
        detail = run_ckpt(sys.argv[5])
    elif mode == "edit":
        detail = run_edit(nprocs)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    print(f"MULTIHOST_OK mode={mode} rank={rank} devices={n_global} "
          f"{detail}", flush=True)


if __name__ == "__main__":
    main()
