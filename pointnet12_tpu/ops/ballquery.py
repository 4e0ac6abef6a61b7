"""Fixed-K radius neighborhood search ("ball query").

Reference behavior (model/pointnet_util.py::query_ball_point, SURVEY.md §2).
The semantics matter for parity and are NOT "K nearest within radius":

1. candidate indices with ``sqrdist > radius^2`` are replaced by ``N``,
2. the index array is sorted ascending (so in-radius points come first,
   **ordered by index**, not by distance),
3. the first ``nsample`` entries are taken,
4. remaining ``N`` markers (out-of-radius slots) are replaced by the FIRST
   in-radius index — i.e. padded with duplicates of the first neighbor.

Because query centers come from FPS over the same cloud, the center itself is
always in-radius (distance 0), so slot 0 is always valid.

TPU-native design: instead of materializing and sorting a ``(B, S, N)``
index matrix, build ``score = where(in_radius, point_index, N)`` and take the
``nsample`` smallest scores with ``lax.top_k`` on the negated score — O(N·K)
selection, no full sort. The distance matrix itself is one MXU einsum. The
Pallas fast path computes distances tile-by-tile so ``(B, S, N)`` never
touches HBM.
"""

import jax.numpy as jnp
from jax import lax

from pointnet12_tpu.ops.distance import square_distance

# Minimum N for the voxel-grid kernel under impl="auto" (module-level so
# benchmarks can sweep the crossover without editing the dispatch). Grid v3
# (three fixed window-ranges per tile, no XLA-side window prep) wins inside
# the train step from N=4096 up: 19.48 vs 20.88 ms/step at the flagship
# shape, same-process A/B. v2's prep chain lost here — see
# kernels/ballquery_grid.py docstring.
GRID_MIN_N = 4096


def _ballquery_jnp(
    radius: float, nsample: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray
) -> jnp.ndarray:
    B, N, _ = xyz.shape
    sqrdists = square_distance(new_xyz, xyz)  # (B, S, N)
    idx = jnp.arange(N, dtype=jnp.int32)
    score = jnp.where(sqrdists <= radius * radius, idx, N)  # (B, S, N)
    # K smallest scores == first-K in-radius indices (ascending), padded by N.
    neg_val, _ = lax.top_k(-score, nsample)  # values descending => score asc
    group_idx = -neg_val  # (B, S, nsample), sorted ascending, N = padding
    first = group_idx[..., :1]
    return jnp.where(group_idx == N, first, group_idx).astype(jnp.int32)


def query_ball_point(
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    *,
    impl: str = "auto",
) -> jnp.ndarray:
    """Indices of up to ``nsample`` points of ``xyz`` within ``radius`` of each query.

    Args:
      radius: ball radius (static float).
      nsample: fixed group size K (static).
      xyz: ``(B, N, 3)`` all points.
      new_xyz: ``(B, S, 3)`` query centers.
      impl: ``"jnp"``, ``"pallas"`` or ``"auto"``.

    Returns:
      ``(B, S, nsample)`` int32 indices into N, replicating the reference's
      first-K-by-index + pad-with-first semantics.
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    if impl == "auto":
        from pointnet12_tpu.kernels import dispatch

        if dispatch.pallas_enabled():
            impl = (
                "grid"
                if (N >= GRID_MIN_N and N % 128 == 0 and S % 128 == 0)
                else "pallas"
            )
        else:
            impl = "jnp"
    if impl == "grid":
        from pointnet12_tpu.kernels.ballquery_grid import ballquery_grid

        out = ballquery_grid(radius, nsample, xyz, new_xyz)
    elif impl == "pallas":
        from pointnet12_tpu.kernels.ballquery_pallas import ballquery_pallas

        out = ballquery_pallas(radius, nsample, xyz, new_xyz)
    else:
        return _ballquery_jnp(radius, nsample, xyz, new_xyz)

    from pointnet12_tpu.kernels import selfcheck

    if selfcheck.collecting():
        # sanitizer mode: double-compute against the exact jnp twin,
        # excluding fp-radius-boundary rows (both answers legitimate there)
        ref = _ballquery_jnp(radius, nsample, xyz, new_xyz)
        ok = selfcheck.boundary_ok_mask(radius, xyz, new_xyz)[..., None]
        selfcheck.assert_match(f"ballquery[{impl}]", out, ref, ok)
    return out
