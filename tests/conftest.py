"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI, so sharding is validated on a
forced-host-platform device mesh (SURVEY.md §4: multi-host tests via
``xla_force_host_platform_device_count``). These env vars must be set
before jax initializes its backends, hence the top of conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A site-wide boot shim may have already forced jax_platforms to the real
# TPU backend at interpreter start; tests always run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_prng_impl", "threefry2x32")
jax.config.update("jax_threefry_partitionable", True)


def pytest_configure(config):
    assert jax.device_count() == 8, (
        f"expected 8 virtual CPU devices, got {jax.devices()}"
    )
