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
    """
    B, N, C = points.shape
    flat_idx = idx.reshape(B, -1)  # (B, prod(S))
    gathered = jnp.take_along_axis(points, flat_idx[:, :, None], axis=1)
    return gathered.reshape(*idx.shape, C)
