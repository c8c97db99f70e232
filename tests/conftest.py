"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding code paths are validated without TPU hardware by forcing
the host platform and splitting it into 8 virtual devices (the approach the
reference lacks entirely — it has no distributed tests; see SURVEY.md §4).

NOTE: this environment's sitecustomize registers an ``axon`` TPU backend and
overrides JAX_PLATFORMS, so the env var alone is not enough — we must also
update jax.config after import, before any backend is initialized. This keeps
unit tests off the (remote-compiled, slow) tunneled TPU.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Set POREOVER_TPU_TESTS=1 to run the hardware (Pallas) tests on a real TPU
# instead of the virtual CPU mesh: `POREOVER_TPU_TESTS=1 pytest tests/test_pallas.py`
if not os.environ.get("POREOVER_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
