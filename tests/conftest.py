"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated here without TPU hardware via
``xla_force_host_platform_device_count`` (the standard JAX substitute for
multi-device CI); the driver's dryrun does the same for the full train step.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin in this image ignores the JAX_PLATFORMS env var; the
# config knob does force the CPU backend (with the 8 virtual devices above).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
