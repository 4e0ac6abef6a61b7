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

import jax
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

        d, i = three_nn_pallas(query_xyz, ref_xyz)
        from pointnet12_tpu.kernels import selfcheck

        if selfcheck.collecting():
            # sanitizer mode: index parity vs the jnp twin off near-tie
            # rows (slot order is fp-unstable there; distance VALUES agree
            # either way — see bench.py::verify_kernels)
            _, i_ref = three_nn(query_xyz, ref_xyz, impl="jnp")
            ok = selfcheck.tie_ok_mask(query_xyz, ref_xyz)[..., None]
            selfcheck.assert_match("three_nn", i, i_ref, ok)
        return d, i
    sqrdists = square_distance(query_xyz, ref_xyz)  # (B, N, M)
    neg, idx = lax.top_k(-sqrdists, 3)
    return -neg, idx.astype(jnp.int32)


@jax.custom_vjp
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

    The custom VJP exists because the naive gradient w.r.t. ``ref_feats``
    is ``scatter_add(w * g, idx)`` — a B*N*3-row scatter that XLA executes
    row-serialized (1.45 ms/step for FP1 alone at the flagship shape,
    profiled). The backward instead contracts the cotangent against an
    on-the-fly one-hot selection matrix on the MXU (ops/segsum.py).
    """
    w = 1.0 / (dists + _EPS)  # (B, N, 3)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    # three FLAT (B, N, C) gathers + fused FMA instead of one (B, N, 3, C)
    # gather: same row count, but the 4-D form cost a ~0.2 ms layout
    # relayout + separate bf16-cast fusion at the flagship shape (profiled)
    out = index_points(ref_feats, idx[:, :, 0]) * w[:, :, 0:1]
    for j in (1, 2):
        out = out + index_points(ref_feats, idx[:, :, j]) * w[:, :, j : j + 1]
    return out


def _three_interpolate_fwd(ref_feats, idx, dists):
    return three_interpolate(ref_feats, idx, dists), (ref_feats, idx, dists)


def _three_interpolate_bwd(res, g):
    from pointnet12_tpu.ops.segsum import segment_matmul

    ref_feats, idx, dists = res
    M = ref_feats.shape[1]
    u = 1.0 / (dists + _EPS)
    t = jnp.sum(u, axis=-1, keepdims=True)
    w = u / t  # (B, N, 3)

    # d ref_feats: transpose-gather of w*g, scatter-free on the MXU
    idx_t = jnp.transpose(idx, (0, 2, 1))  # (B, 3, N)
    w_t = jnp.transpose(w, (0, 2, 1))
    dref = segment_matmul(idx_t, w_t, g, M).astype(ref_feats.dtype)

    # d dists: through the normalized inverse-distance weights (dead code —
    # XLA-eliminated — whenever coordinates carry no gradient, the usual case)
    neighbors = index_points(ref_feats, idx)  # (B, N, 3, C)
    dw = jnp.einsum("bnc,bnjc->bnj", g.astype(jnp.float32),
                    neighbors.astype(jnp.float32))
    proj = jnp.sum(dw * w, axis=-1, keepdims=True)
    ddists = (-(u**2) * (dw - proj) / t).astype(dists.dtype)

    didx = jnp.zeros(idx.shape, jax.dtypes.float0)
    return dref, didx, ddists


three_interpolate.defvjp(_three_interpolate_fwd, _three_interpolate_bwd)
