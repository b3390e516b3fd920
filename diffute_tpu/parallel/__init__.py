from diffute_tpu.parallel.mesh import (  # noqa: F401
    DevicePrefetcher,
    make_mesh,
    batch_sharding,
    maybe_init_distributed,
    place_global,
    replicate_tree,
    replicated_sharding,
    shard_batch,
    zero1_shardings,
)
