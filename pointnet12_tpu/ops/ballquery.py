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

# impl="auto" crossovers (module-level so benchmarks can sweep them
# without editing the dispatch). Measured same-process on v5e
# (bench/bitmask_ab.py, round 3, v2 32-bit packing; dense is the
# cross-session anchor — see kernels/ballquery_bitmask.py for v1 bands):
#
#   shape                      bitmask v2  dense        grid
#   SA1  N=4096 S=1024 K=32    1.024       4.40-4.57    1.74-2.16  ms
#   SA2  N=1024 S=256  K=32    0.143       0.27-0.35    0.43-0.50
#   SA3  N=256  S=64   K=32    0.036       0.018-0.045  —
#   MSG  N=4096 S=512  K=64    0.872       4.16-4.26    14.27-14.33
#
# The bitmask kernel (MXU bit-pack + lowest-set-bit extraction) wins from
# N=1024 up and needs no XLA-side prep; dense prefix-rank wins below
# (bitmask's N/32 word lanes run underfull there). Above N=4096 the
# kernel switches to chunked packing (the single-slab pack matrices plus
# full-width distance tile would exceed the 16 MB scoped-VMEM limit at
# N=8192), which needs a pow2 chunk divisor <= 4096 of N. At aligned N >= 8192 the voxel-grid kernel takes over: its candidate
# windows stay constant-width while the bitmask scan grows linearly with
# N; the bitmask kernel still covers large-N shapes the grid kernel's
# alignment rules exclude (S % 128 != 0).
BITMASK_MIN_N = 1024
GRID_MIN_N = 8192


def _bitmask_ok(n: int) -> bool:
    """Shapes ballquery_bitmask accepts: N % 32 == 0 (32-bit mask words),
    and above the single-slab limit a pow2 chunk divisor of N (kernel
    precondition)."""
    if n % 32 != 0 or n < BITMASK_MIN_N:
        return False
    if n <= 4096:
        return True
    return any(n % c == 0 for c in (4096, 2048, 1024, 512, 256, 128))


def _route(n: int, s: int) -> str:
    """impl="auto" kernel choice for a (N, S) shape — see crossover table."""
    if n >= GRID_MIN_N and n % 128 == 0 and s % 128 == 0:
        return "grid"
    if _bitmask_ok(n):
        return "bitmask"
    return "pallas"


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

        impl = _route(N, S) if dispatch.pallas_enabled() else "jnp"
    if impl == "grid":
        from pointnet12_tpu.kernels.ballquery_grid import ballquery_grid

        out = ballquery_grid(radius, nsample, xyz, new_xyz)
    elif impl == "bitmask":
        from pointnet12_tpu.kernels.ballquery_bitmask import ballquery_bitmask

        out = ballquery_bitmask(radius, nsample, xyz, new_xyz)
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
