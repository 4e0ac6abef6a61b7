"""Farthest-point sampling (FPS).

Reference behavior (model/pointnet_util.py::farthest_point_sample,
SURVEY.md §2): iteratively pick ``npoint`` seeds maximizing the minimum
distance to the already-picked set, carrying a running-min ``distance (B, N)``
array; the start point is random (``torch.randint``). Ties in the argmax
resolve to the first (lowest) index, matching torch CPU semantics.

TPU-native design: the whole iteration is ONE compiled XLA program
(``lax.fori_loop`` carrying ``(distance, farthest, idx_buffer)``) instead of
the reference's ``npoint`` sequential CUDA launches. The Pallas fast path
(:mod:`pointnet12_tpu.kernels.fps_pallas`) additionally pins ``distance`` and
the point coordinates in VMEM across iterations.
"""

from typing import Optional

import jax
import jax.numpy as jnp


def _fps_jnp(xyz: jnp.ndarray, npoint: int, start: jnp.ndarray) -> jnp.ndarray:
    """Pure-XLA FPS. xyz: (B, N, 3) fp32; start: (B,) int32 start indices."""
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)

    def body(i, carry):
        distance, farthest, idx_buf = carry
        idx_buf = idx_buf.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)
        dist = jnp.sum((xyz - centroid) ** 2, axis=-1)  # (B, N)
        distance = jnp.minimum(distance, dist)
        farthest = jnp.argmax(distance, axis=-1).astype(jnp.int32)
        return distance, farthest, idx_buf

    init = (
        # 1e10, not inf: matches the Pallas kernel, the torch oracle, and the
        # reference's saturating init so argmax tie-breaks agree even for
        # clouds with squared extents > 1e10 (CLAUDE.md invariant).
        jnp.full((B, N), 1e10, dtype=jnp.float32),
        start.astype(jnp.int32),
        jnp.zeros((B, npoint), dtype=jnp.int32),
    )
    _, _, idx_buf = jax.lax.fori_loop(0, npoint, body, init)
    return idx_buf


def farthest_point_sample(
    xyz: jnp.ndarray,
    npoint: int,
    *,
    key: Optional[jax.Array] = None,
    start_idx: int = 0,
    impl: str = "auto",
) -> jnp.ndarray:
    """Sample ``npoint`` indices by farthest-point sampling.

    Args:
      xyz: ``(B, N, 3)`` point coordinates.
      npoint: number of samples (static).
      key: optional PRNG key for a random start point per batch element
        (reference uses ``torch.randint``). If ``None``, all batch elements
        start at ``start_idx`` — deterministic, used for parity tests.
      start_idx: deterministic start index when ``key is None``.
      impl: ``"jnp"``, ``"pallas"`` or ``"auto"`` (pallas on TPU, jnp else).

    Returns:
      ``(B, npoint)`` int32 indices into N.
    """
    B, N, _ = xyz.shape
    if not 0 < npoint <= N:
        raise ValueError(f"npoint={npoint} must be in (0, {N}]")
    if key is not None:
        start = jax.random.randint(key, (B,), 0, N, dtype=jnp.int32)
    else:
        start = jnp.full((B,), start_idx, dtype=jnp.int32)

    if impl == "auto":
        from pointnet12_tpu.kernels import dispatch

        impl = "pallas" if dispatch.pallas_enabled() else "jnp"
    if impl == "pallas":
        from pointnet12_tpu.kernels.fps_pallas import fps_pallas

        out = fps_pallas(xyz, npoint, start)
        from pointnet12_tpu.kernels import selfcheck

        if selfcheck.collecting():
            # sanitizer mode: double-compute against the exact jnp twin
            # (both impls are bit-identical: same distance form, 1e10
            # init, first-index argmax ties)
            selfcheck.assert_match("fps", out, _fps_jnp(xyz, npoint, start))
        return out
    return _fps_jnp(xyz, npoint, start)
