"""Test harness config: run everything on a virtual 8-device CPU mesh.

Single real TPU chip only (SURVEY.md §7) — multi-device semantics are tested
via XLA's host-platform device-count emulation. Pallas kernels run in
interpreter mode on CPU (see test_kernels.py); TPU-compiled runs are covered
by bench.py and the driver's entry checks on real hardware.
"""

import os

# Must be set before JAX initializes its backends.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize pins JAX_PLATFORMS=axon; override for hermetic CPU
# tests (the real-TPU path is exercised by bench.py / __graft_entry__.py).
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
