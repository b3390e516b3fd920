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
