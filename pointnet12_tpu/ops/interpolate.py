"""3-NN inverse-distance interpolation (the seg decoder's upsampling op).

Reference behavior (model/pointnet_util.py, inlined in
PointNetFeaturePropagation.forward; SURVEY.md §2): for every fine point find
its 3 nearest coarse points by sorting the pairwise squared distances, weight
them by normalized inverse distance ``1/(d + 1e-8)``, and take the weighted
sum of coarse features. The single-coarse-point case (S == 1) broadcasts.

TPU-native design: ``lax.top_k`` over the negated distance row replaces the
full sort (O(N·3) selection), and the gather + weighted sum fuse into the
surrounding XLA program.
"""

from typing import Tuple

import jax.numpy as jnp
from jax import lax

from pointnet12_tpu.ops.distance import square_distance
from pointnet12_tpu.ops.gather import index_points

_EPS = 1e-8


def three_nn(
    query_xyz: jnp.ndarray,
    ref_xyz: jnp.ndarray,
    *,
    impl: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Three nearest reference points per query point.

    Args:
      query_xyz: ``(B, N, 3)`` fine points.
      ref_xyz: ``(B, M, 3)`` coarse points, M >= 3.
      impl: ``"jnp"``, ``"pallas"`` or ``"auto"``.

    Returns:
      ``(dists, idx)``: ``(B, N, 3)`` squared distances (ascending) and
      int32 indices into M.
    """
    if impl == "auto":
        from pointnet12_tpu.kernels import dispatch

        impl = "pallas" if dispatch.pallas_enabled() else "jnp"
    if impl == "pallas":
        from pointnet12_tpu.kernels.threenn_pallas import three_nn_pallas

        return three_nn_pallas(query_xyz, ref_xyz)
    sqrdists = square_distance(query_xyz, ref_xyz)  # (B, N, M)
    neg, idx = lax.top_k(-sqrdists, 3)
    return -neg, idx.astype(jnp.int32)


def three_interpolate(
    ref_feats: jnp.ndarray, idx: jnp.ndarray, dists: jnp.ndarray
) -> jnp.ndarray:
    """Inverse-distance weighted sum of 3-NN reference features.

    Args:
      ref_feats: ``(B, M, C)`` coarse features.
      idx: ``(B, N, 3)`` int32 indices from :func:`three_nn`.
      dists: ``(B, N, 3)`` squared distances from :func:`three_nn`.

    Returns:
      ``(B, N, C)`` interpolated features.
    """
    w = 1.0 / (dists + _EPS)  # (B, N, 3)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    neighbors = index_points(ref_feats, idx)  # (B, N, 3, C)
    return jnp.sum(neighbors * w[..., None], axis=2)
