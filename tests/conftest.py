"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding tests run against ``jax.sharding.Mesh`` over 8 virtual CPU
devices (no TPU needed in CI), per SURVEY.md §4.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon boot shim (sitecustomize) force-sets jax_platforms="axon,cpu" at
# interpreter start; override it so tests run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    The suite compiles hundreds of large interpret-mode kernel programs;
    with the jit cache holding every one of them, the XLA CPU compiler
    eventually segfaults partway through a full run (reproduced at ~25%
    on the 1-core CI box).  Cross-module cache reuse is ~nil, so clearing
    per module costs little and keeps the compiler healthy."""
    yield
    jax.clear_caches()
