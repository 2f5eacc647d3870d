"""Test config: force CPU with 8 virtual devices so sharding tests run
without TPU hardware.

The environment's sitecustomize registers the 'axon' TPU platform at
interpreter startup and forces jax_platforms=axon, so setting the env var is
not enough — we must also jax.config.update after import. XLA_FLAGS must be
set before the CPU client initializes (first jax computation)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()
