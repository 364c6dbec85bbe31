"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The reference framework's tests require a CUDA GPU (BasicSR/tests/README.md:3)
and its distributed path was never testable without a cluster. Here every
test runs on CPU with 8 virtual devices so sharding/collective code is
exercised deterministically on any machine.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even if the shell targets a TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The image's sitecustomize force-registers the TPU backend regardless of
# JAX_PLATFORMS in the environment; override at the config level.
jax.config.update("jax_platforms", "cpu")
