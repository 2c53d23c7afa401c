"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI, so sharding is validated on a
forced-host-platform device mesh (SURVEY.md §4: multi-host tests via
``xla_force_host_platform_device_count``). These env vars must be set
before jax initializes its backends, hence the top of conftest.

Exception: the ON-TPU SMOKE GATE (tests marked ``tpu``, see
docs/TPU_GATE.md). ``AZ_TPU_GATE=1`` keeps the real backend so Mosaic
kernel lowering regressions fail a TEST instead of the round bench:

    AZ_TPU_GATE=1 PYTHONPATH=/root/.axon_site:/root/repo \\
        python -m pytest tests/ -q -m tpu
"""

import os

_TPU_GATE = bool(os.environ.get("AZ_TPU_GATE"))

if not _TPU_GATE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _TPU_GATE:
    # A site-wide boot shim may have already forced jax_platforms to the
    # real TPU backend at interpreter start; tests run on the virtual CPU
    # mesh unless the TPU gate is explicitly requested.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_prng_impl", "threefry2x32")
jax.config.update("jax_threefry_partitionable", True)


def pytest_configure(config):
    if _TPU_GATE:
        assert jax.default_backend() == "tpu", (
            f"AZ_TPU_GATE=1 requires the real TPU backend, got "
            f"{jax.default_backend()} ({jax.devices()}); run with "
            "PYTHONPATH=/root/.axon_site:... so the axon platform registers"
        )
    else:
        assert jax.device_count() == 8, (
            f"expected 8 virtual CPU devices, got {jax.devices()}"
        )
