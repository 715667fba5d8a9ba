"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backends — this file is
imported by pytest before any test module imports jax.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize force-registers the remote TPU backend with
# platform priority "axon,cpu" regardless of JAX_PLATFORMS; tests must run on
# the local virtual CPU mesh, so override the config after import.  Setting
# NRHINTS_TPU_TESTS=1 keeps the real TPU backend (for tests/test_kernels.py).
if os.environ.get("NRHINTS_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
