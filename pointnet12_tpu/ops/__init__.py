"""L1 point-cloud ops: jnp reference implementations.

These are the TPU-native equivalents of the reference's vectorized-torch op
layer (reference: model/pointnet_util.py — square_distance, index_points,
farthest_point_sample, query_ball_point, sample_and_group; see SURVEY.md §2).
All functions take channels-last ``(B, N, C)`` arrays and are jit-safe
(static shapes, `lax` control flow only).

The Pallas fast path lives in :mod:`pointnet12_tpu.kernels`; dispatch between
the two is handled by the ``impl=`` argument on the public entry points.
"""

from pointnet12_tpu.ops.distance import square_distance
from pointnet12_tpu.ops.gather import index_points
from pointnet12_tpu.ops.fps import farthest_point_sample
from pointnet12_tpu.ops.ballquery import query_ball_point
from pointnet12_tpu.ops.interpolate import three_nn, three_interpolate
from pointnet12_tpu.ops.grouping import sample_and_group, sample_and_group_all

__all__ = [
    "square_distance",
    "index_points",
    "farthest_point_sample",
    "query_ball_point",
    "three_nn",
    "three_interpolate",
    "sample_and_group",
    "sample_and_group_all",
]
