"""Batched point gathers.

Reference behavior (model/pointnet_util.py::index_points, SURVEY.md §2):
``points (B, N, C)`` indexed with ``idx (B, S)`` or ``(B, S, K)`` yields
``(B, S, C)`` / ``(B, S, K, C)``. On TPU this lowers to a single XLA gather;
indices are clipped into range (jnp semantics), which the callers rely on for
the ball-query pad-with-first trick.
"""

import jax.numpy as jnp


def index_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather ``points[b, idx[b, ...], :]`` for every batch element.

    Args:
      points: ``(B, N, C)``.
      idx: integer array ``(B, *S)`` with values in ``[0, N)``.

    Returns:
      ``(B, *S, C)``.

    Implementation note: lowered as ONE flat single-axis ``jnp.take`` on
    ``(B*N, C)`` with batch offsets folded into the indices — measured 3x
    faster on v5e than the batched ``take_along_axis`` gather (0.93 ms vs
    2.7 ms for 512K rows), whose per-batch-dim descriptors XLA handles
    poorly. Out-of-range indices clamp (same as take_along_axis on TPU).

    ``mode="clip"`` matters: ``jnp.take``'s default ``mode="fill"``
    lowers to gather + an oob-predicate broadcast-select over the full
    gathered tensor — 0.47 ms/step of pure waste at the flagship shape
    (profiled round 3; clip lowers to the plain clamped gather, and the
    indices are already clamped explicitly below).
    """
    B, N, C = points.shape
    flat_idx = idx.reshape(B, -1).astype(jnp.int32)  # (B, prod(S))
    # clamp BEFORE adding batch offsets so OOB can't cross into the
    # neighboring cloud (callers rely on clamping semantics)
    flat_idx = jnp.clip(flat_idx, 0, N - 1)
    offsets = (jnp.arange(B, dtype=jnp.int32) * N)[:, None]
    gathered = jnp.take(
        points.reshape(B * N, C),
        (flat_idx + offsets).reshape(-1),
        axis=0,
        mode="clip",
    )
    return gathered.reshape(*idx.shape, C)
