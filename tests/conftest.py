"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding is tested on a virtual CPU mesh
(``xla_force_host_platform_device_count=8``) — no TPU needed for the suite.

Note: the container's sitecustomize pre-imports jax and sets
``JAX_PLATFORMS=axon`` (a single tunneled TPU), so plain env mutation is
ignored; ``jax.config.update`` is required.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache: repeat test runs skip XLA recompilation.
jax.config.update("jax_compilation_cache_dir", "/tmp/diffute_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
