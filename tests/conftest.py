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

# Fast/slow split (VERDICT r4 item 8): `pytest -m fast` is the <5-min
# mid-session gate covering the core ops/parity/model surface; the full
# unmarked run stays the merge gate (~33 min measured round 4). Markers
# are assigned per FILE here so new tests inherit the right bucket.
_FAST_FILES = {
    "test_ops.py",          # L1 op semantics + torch oracles
    "test_parity.py",       # logit parity vs imported torch weights
    "test_models.py",       # model zoo construction/shapes
    "test_foldbn.py",       # eval BN-fold equivalence
    "test_torch_ref_fast.py",  # oracle execution-path equivalence
    "test_compile_surface.py",  # no-recompile invariants
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.fspath.basename
        item.add_marker(
            pytest.mark.fast if name in _FAST_FILES else pytest.mark.slow
        )


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
