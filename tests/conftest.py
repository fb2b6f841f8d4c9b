import os

# Tests always run on a simulated 8-device CPU mesh so multi-chip sharding
# logic is exercised without TPU hardware (SURVEY.md §4).  The axon
# sitecustomize registers the TPU backend at interpreter start and overrides
# JAX_PLATFORMS, so we must force the platform via jax.config *before any
# test imports jax functionality*.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
