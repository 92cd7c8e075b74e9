"""Test env: force CPU with an 8-device virtual mesh.

Pallas kernels run in interpret mode on CPU (the analog of the reference's
no-GPU standalone harnesses); sharding tests get 8 virtual devices, matching
how the driver dry-runs the multi-chip path.

Note: the host image registers a TPU ('axon') PJRT plugin from sitecustomize
and forces jax_platforms='axon'; backends are not yet initialized when this
conftest runs, so overriding the config here reliably lands tests on CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
