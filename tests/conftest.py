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
# XLA:CPU caches AOT executables keyed by HLO but NOT host CPU features, and
# /tmp can outlive a machine migration (observed: a cache written on an
# avx10/amx-fp16 host produced feature-mismatch load errors — and per XLA's
# own warning, potential SIGILL — on its replacement), so key the cache dir
# by a fingerprint of this host's CPU flags.


def _cpu_fingerprint() -> str:
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    return "nofp"


jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/diffute_jax_cache_cpu_{_cpu_fingerprint()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
