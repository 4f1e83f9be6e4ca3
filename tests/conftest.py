"""Test configuration: run everything on a virtual 8-device CPU mesh with x64.

Geometry/solver unit tests want fp64 for tight analytic tolerances; the CPU
backend provides it.  TPU runs use fp32 — production paths are dtype-
polymorphic and tested for fp32 tolerance separately where it matters.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell presets JAX_PLATFORMS=axon (TPU tunnel)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_enable_x64", True)
