"""Kernel self-check sanitizer: run the Pallas fast path AND the exact jnp
reference in the same jitted program and fail loudly on divergence.

SURVEY.md §5 mandates a kernel-sanitizer story; interpret-mode tests cover
the kernel LOGIC on CPU and ``bench.py --verify`` spot-checks the Mosaic
lowering at flagship shapes, but neither guards a production run at ITS
shapes. With ``POINTNET12_TPU_SELFCHECK=1`` (or :func:`set_selfcheck`),
every dispatched op double-computes against its jnp twin and raises from a
:func:`jax.debug.callback` on the first off-boundary mismatch — the TPU
analog of a CUDA memcheck/compute-sanitizer run: ~2x step cost, zero code
changes, exact coverage of the shapes/dtypes the run actually uses.

Boundary handling mirrors tests/test_kernels.py: query rows with any point
within fp tolerance of the radius boundary are excluded for ball query
(expansion-form vs direct distances legitimately flip there), near-tie
rows for 3-NN.
"""

import os
from functools import partial

import jax
import jax.numpy as jnp

_FORCED: dict = {"value": None}


def set_selfcheck(enabled) -> None:
    """Force-enable/disable self-check (None restores env control)."""
    _FORCED["value"] = enabled


def selfcheck_enabled() -> bool:
    if _FORCED["value"] is not None:
        return bool(_FORCED["value"])
    return os.environ.get("POINTNET12_TPU_SELFCHECK", "0") == "1"


class KernelMismatchError(AssertionError):
    """A Pallas kernel disagreed with its jnp reference at runtime."""


def _raise_on_mismatch(name, count):
    count = int(count)
    if count:
        raise KernelMismatchError(
            f"selfcheck: kernel '{name}' disagrees with its jnp reference "
            f"on {count} off-boundary element(s) at runtime shapes"
        )


def assert_match(name, got, ref, ok_mask=None):
    """In-jit comparison; raises (via debug callback) on any mismatch.

    ``ok_mask`` broadcasts against the outputs; False entries are excluded
    (fp-boundary / tie rows where both answers are legitimate).
    """
    bad = got != ref
    if ok_mask is not None:
        bad = jnp.logical_and(bad, ok_mask)
    count = jnp.sum(bad.astype(jnp.int32))
    jax.debug.callback(partial(_raise_on_mismatch, name), count)


def boundary_ok_mask(radius, xyz, new_xyz, tol=1e-5):
    """(B, S) True where NO point sits within ``tol`` of the radius
    boundary — rows where first-K-by-index selection is fp-stable."""
    d2 = jnp.sum(
        (new_xyz[:, :, None, :].astype(jnp.float32)
         - xyz[:, None, :, :].astype(jnp.float32)) ** 2,
        axis=-1,
    )
    return ~jnp.any(jnp.abs(d2 - radius * radius) < tol, axis=-1)


def tie_ok_mask(query_xyz, ref_xyz, tol=1e-6):
    """(B, N) True where the 4 nearest references are pairwise separated by
    more than ``tol`` — rows where 3-NN slot order is fp-stable."""
    d2 = jnp.sum(
        (query_xyz[:, :, None, :].astype(jnp.float32)
         - ref_xyz[:, None, :, :].astype(jnp.float32)) ** 2,
        axis=-1,
    )
    low4 = -jax.lax.top_k(-d2, 4)[0]  # ascending 4 smallest
    return jnp.min(jnp.diff(low4, axis=-1), axis=-1) > tol
