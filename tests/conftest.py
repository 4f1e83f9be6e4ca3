"""Test configuration: run everything on a virtual 8-device CPU mesh with x64.

Geometry/solver unit tests want fp64 for tight analytic tolerances; the CPU
backend provides it.  TPU runs use fp32 — production paths are dtype-
polymorphic and tested for fp32 tolerance separately where it matters.

The container's sitecustomize force-registers the 'axon' TPU-tunnel PJRT
plugin in every interpreter; its relay handshake can block for minutes, so
tests unregister it before jax initializes any backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell presets JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax
import jax._src.xla_bridge as _xb

_xb._backend_factories.pop("axon", None)  # drop the TPU-tunnel plugin for CPU tests

# sitecustomize imports jax with JAX_PLATFORMS=axon before conftest runs, so
# the env override above is too late for jax.config — update it explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest

_last_module = [None]


@pytest.fixture(autouse=True)
def _clear_jax_caches_between_modules(request):
    """Free compiled executables when the test module changes.

    The full suite compiles hundreds of jitted programs; letting them all
    accumulate in the XLA:CPU backend has produced a segfault inside
    backend_compile on this host (~150 tests in).  Per-module clearing
    bounds the live-executable count at a small recompile cost.
    """
    mod = request.module.__name__
    if _last_module[0] is not None and _last_module[0] != mod:
        jax.clear_caches()
    _last_module[0] = mod
    yield
