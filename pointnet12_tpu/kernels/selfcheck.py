"""Kernel self-check sanitizer: run the Pallas fast path AND the exact jnp
reference in the same jitted program and fail loudly on divergence.

SURVEY.md §5 mandates a kernel-sanitizer story; interpret-mode tests cover
the kernel LOGIC on CPU and ``bench.py --verify`` spot-checks the Mosaic
lowering at flagship shapes, but neither guards a production run at ITS
shapes. With ``POINTNET12_TPU_SELFCHECK=1`` (or :func:`set_selfcheck`),
the train/eval steps double-compute every dispatched op against its jnp
twin and raise :class:`KernelMismatchError` on the first off-boundary
divergence — the TPU analog of a CUDA compute-sanitizer run: ~2x step
cost, zero code changes, exact coverage of the shapes/dtypes the run
actually uses.

Mechanism (constrained by this box's backend): ``jax.debug.callback`` and
``checkify`` are both unusable — the axon PJRT relay rejects host
callbacks, and checkify's error-state rewriting inserts extra carries into
the Pallas kernels' ``fori_loop``s, which Mosaic's scan pattern-match
refuses. Instead, a TRACE-TIME COLLECTOR is active while the checked
function is traced: each dispatched op appends its mismatch-count tracer,
the wrapper returns those counts as ordinary jit outputs, and the host
raises if any is nonzero. For the train step the checks run in a shadow
no-grad forward (same rng folding), since tracers created under
``value_and_grad`` could not escape to the top level.

Boundary handling mirrors tests/test_kernels.py: query rows with any point
within fp tolerance of the radius boundary are excluded for ball query
(expansion-form vs direct distances legitimately flip there), near-tie
rows for 3-NN.
"""

import os
from contextlib import contextmanager

import jax
import jax.numpy as jnp

_FORCED: dict = {"value": None}
_COLLECTOR: dict = {"items": None}


def set_selfcheck(enabled) -> None:
    """Force-enable/disable self-check (None restores env control)."""
    _FORCED["value"] = enabled


def selfcheck_enabled() -> bool:
    if _FORCED["value"] is not None:
        return bool(_FORCED["value"])
    return os.environ.get("POINTNET12_TPU_SELFCHECK", "0") == "1"


def collecting() -> bool:
    """True while a checked function is being traced — the ops' gate."""
    return _COLLECTOR["items"] is not None


@contextmanager
def collect():
    """Trace-time collector scope; yields the list of (name, count)."""
    prev = _COLLECTOR["items"]
    _COLLECTOR["items"] = items = []
    try:
        yield items
    finally:
        _COLLECTOR["items"] = prev


class KernelMismatchError(AssertionError):
    """A Pallas kernel disagreed with its jnp reference at runtime."""


def assert_match(name, got, ref, ok_mask=None):
    """Emit an off-``ok_mask`` mismatch count into the active collector.

    ``ok_mask`` broadcasts against the outputs; False entries are excluded
    (fp-boundary / tie rows where both answers are legitimate). No-op
    outside a :func:`collect` scope.
    """
    if not collecting():
        return
    bad = got != ref
    if ok_mask is not None:
        bad = jnp.logical_and(bad, ok_mask)
    _COLLECTOR["items"].append((name, jnp.sum(bad.astype(jnp.int32))))


def assert_close(name, got, ref, ok_mask=None, atol=1e-3):
    """Float variant of :func:`assert_match`: counts off-mask elements with
    ``|got - ref| > atol`` (fused kernels reassociate matmuls, so exact
    equality is the wrong bar)."""
    if not collecting():
        return
    bad = jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)) > atol
    if ok_mask is not None:
        bad = jnp.logical_and(bad, ok_mask)
    _COLLECTOR["items"].append((name, jnp.sum(bad.astype(jnp.int32))))


def raise_if_any(counts) -> None:
    """Host-side: raise on the first nonzero mismatch count."""
    for name, c in counts.items():
        c = int(c)
        if c:
            raise KernelMismatchError(
                f"selfcheck: kernel '{name}' disagrees with its jnp "
                f"reference on {c} off-boundary element(s) at runtime shapes"
            )


def wrap(fn):
    """Checked version of ``fn`` (same signature): every dispatched op
    traced inside it double-computes vs its jnp twin; raises
    :class:`KernelMismatchError` on the host if any diverged. ``fn`` must
    not create the ops under an inner transform (grad) — for training,
    check a no-grad shadow forward instead (see train/loop.py)."""

    def traced(*args, **kwargs):
        with collect() as items:
            out = fn(*args, **kwargs)
        counts = {f"{i}:{n}": c for i, (n, c) in enumerate(items)}
        return out, counts

    jfn = jax.jit(traced)

    def wrapped(*args, **kwargs):
        out, counts = jfn(*args, **kwargs)
        raise_if_any(counts)
        return out

    return wrapped


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
