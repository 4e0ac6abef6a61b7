"""Pairwise squared-distance, the workhorse of grouping and interpolation.

Reference behavior (model/pointnet_util.py::square_distance, SURVEY.md §2):
``dist[b, n, m] = ||src[b, n] - dst[b, m]||^2`` computed via the expansion
``||s||^2 + ||d||^2 - 2 s·d`` so the cross term runs on the MXU.
"""

import jax
import jax.numpy as jnp


def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared L2 distance between two point sets.

    Args:
      src: ``(B, N, C)`` query points.
      dst: ``(B, M, C)`` reference points.

    Returns:
      ``(B, N, M)`` squared distances. One einsum (MXU) plus two row-norm
      broadcasts; XLA fuses the adds into the matmul epilogue.
    """
    # -2 * src @ dst^T on the MXU. Precision HIGHEST forces true-fp32 MXU
    # passes: the default bf16 path injects ~1e-3 error, which flips
    # in/out-of-radius decisions at ball-query boundaries (observed on v5e).
    # The contraction dim is 3, so the extra passes are negligible.
    cross = jnp.einsum(
        "bnc,bmc->bnm",
        src,
        dst,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    s2 = jnp.sum(src.astype(jnp.float32) ** 2, axis=-1)  # (B, N)
    d2 = jnp.sum(dst.astype(jnp.float32) ** 2, axis=-1)  # (B, M)
    return s2[:, :, None] - 2.0 * cross + d2[:, None, :]
