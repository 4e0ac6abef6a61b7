"""sample_and_group: FPS + ball query + local-frame feature assembly.

Reference behavior (model/pointnet_util.py::sample_and_group(_all),
SURVEY.md §2): FPS picks ``npoint`` centers, ball query gathers fixed-K
neighborhoods, neighborhood coordinates are re-expressed relative to their
center, and point features (if any) are channel-concatenated, giving
``(B, npoint, nsample, 3 + D)``. ``sample_and_group_all`` forms a single
group of all N points centered at the origin (the global SA layer).

Everything here is gathers + elementwise ops that XLA fuses into the
surrounding SA-layer program; the sampling/query kernels are dispatched via
their ``impl`` flags.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pointnet12_tpu.ops.ballquery import query_ball_point
from pointnet12_tpu.ops.fps import farthest_point_sample
from pointnet12_tpu.ops.gather import index_points


def sample_and_group(
    npoint: int,
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    feats: Optional[jnp.ndarray],
    *,
    fps_key: Optional[jax.Array] = None,
    impl: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample centers and group local neighborhoods.

    Args:
      npoint: number of FPS centers S.
      radius / nsample: ball-query parameters.
      xyz: ``(B, N, 3)`` coordinates.
      feats: optional ``(B, N, D)`` point features.
      fps_key: optional PRNG key for the random FPS start point.
      impl: kernel dispatch for FPS/ball query.

    Returns:
      ``new_xyz (B, S, 3)`` centers and grouped features
      ``(B, S, nsample, 3 + D)`` (or ``(B, S, nsample, 3)`` without feats).
    """
    fps_idx = farthest_point_sample(xyz, npoint, key=fps_key, impl=impl)
    new_xyz = index_points(xyz, fps_idx)  # (B, S, 3)
    group_idx = query_ball_point(radius, nsample, xyz, new_xyz, impl=impl)
    grouped_xyz = index_points(xyz, group_idx)  # (B, S, K, 3)
    grouped_xyz = grouped_xyz - new_xyz[:, :, None, :]  # local frame
    if feats is not None:
        grouped_feats = index_points(feats, group_idx)  # (B, S, K, D)
        grouped = jnp.concatenate([grouped_xyz, grouped_feats], axis=-1)
    else:
        grouped = grouped_xyz
    return new_xyz, grouped


def sample_and_group_all(
    xyz: jnp.ndarray, feats: Optional[jnp.ndarray]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One group containing all points, centered at the origin.

    Returns ``new_xyz (B, 1, 3)`` of zeros and ``(B, 1, N, 3 + D)`` groups.
    """
    B, N, _ = xyz.shape
    new_xyz = jnp.zeros((B, 1, 3), dtype=xyz.dtype)
    grouped_xyz = xyz[:, None, :, :]  # (B, 1, N, 3)
    if feats is not None:
        grouped = jnp.concatenate([grouped_xyz, feats[:, None, :, :]], axis=-1)
    else:
        grouped = grouped_xyz
    return new_xyz, grouped
