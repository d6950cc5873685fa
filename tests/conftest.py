"""Test harness config: run everything on an 8-device virtual CPU mesh so
sharding paths are exercised without TPU hardware (SURVEY.md §4 plan).

Note: the environment may pre-import jax with a hardware platform selected
(sitecustomize), so env vars alone are too late — use config updates, which
take effect as long as no backend has been initialized yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
