"""Backend selection helper for the CLIs.

The container's sitecustomize pre-imports jax with ``JAX_PLATFORMS=axon``
(the tunneled TPU), so plain environment mutation after interpreter start is
ignored; only ``jax.config.update("jax_platforms", ...)`` switches backends.
Every CLI calls :func:`apply_platform_override` right after importing jax so

  DIFFUTE_PLATFORM=cpu python -m diffute_tpu.train.run_ocr --smoke

runs on the host CPU (with ``XLA_FLAGS=--xla_force_host_platform_device_count=N``
for a virtual mesh) while the real chip is busy with another job.
"""

from __future__ import annotations

import os


def apply_platform_override(env_var: str = "DIFFUTE_PLATFORM") -> None:
    value = os.environ.get(env_var)
    if value:
        import jax

        jax.config.update("jax_platforms", value)
    if (value or "tpu") != "cpu":
        # persistent cache only for device backends: XLA:CPU caches AOT
        # executables keyed by HLO but NOT by host CPU features, so a
        # container migrating hosts can reload an executable compiled for
        # different features ("could lead to ... SIGILL" per XLA's own
        # load warning); CPU compiles are cheap, device compiles (4-15 min
        # through the remote service) are the ones worth caching
        enable_persistent_compile_cache()


def enable_persistent_compile_cache(
        env_var: str = "DIFFUTE_COMPILE_CACHE") -> None:
    """Point JAX's persistent compilation cache at a shared directory.

    Full-size compiles through the tunneled remote-compile service take
    4-15 minutes; every CLI/bench process used to pay them again.  The
    persistent cache keys serialized executables by HLO so repeat
    invocations (bench queues, segmented training relaunches, eval loops)
    skip the service entirely.  Opt out with DIFFUTE_COMPILE_CACHE=off.
    """
    path = os.environ.get(env_var, "/tmp/diffute_jax_cache")
    if path.lower() in ("off", "0", "none", ""):
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass  # older jax or a backend that cannot serialize executables
