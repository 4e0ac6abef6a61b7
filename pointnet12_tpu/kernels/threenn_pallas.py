"""Pallas TPU kernel for 3-nearest-neighbor search (FP decoder upsampling).

Ablation on v5e showed the jnp path (square_distance materializing
``(B, N, M)`` in HBM + ``lax.top_k``) costs ~21.6 ms of the flagship's
~41.6 ms forward — the single largest block. This kernel computes distance
tiles of 128 query rows in VMEM and extracts the top-3 with three masked-min
passes, so the ``(B, N, M)`` matrix never exists and no sort runs.

Tie-breaking matches torch's stable ascending sort (equal distances -> lower
index first): each pass takes the row-min value, then the min index
attaining it, then retires that index.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_N = 128
_BIG = 3.4e38  # ~fp32 max; used to retire extracted entries


def _three_nn_kernel(q_ref, p_ref, dist_ref, idx_ref, *, tile_n, mxu):
    _, _, N = q_ref.shape
    M = p_ref.shape[2]
    p = p_ref[0]  # (3, M)
    px, py, pz = p[0:1, :], p[1:2, :], p[2:3, :]
    iota_m = lax.broadcasted_iota(jnp.int32, (tile_n, M), 1)
    if mxu:
        # expansion form: qn + pn - 2 q.p — the cross term rides the MXU
        # (K=3 contraction, HIGHEST so fp32 d2 values stay comparable to
        # the direct form; near-tie index flips are already masked by the
        # selfcheck's tie_ok_mask, ops/interpolate.py:54-59)
        pn = px * px + py * py + pz * pz  # (1, M)

    def tile_body(t, _):
        n0 = t * tile_n
        qt = q_ref[0, :, pl.ds(n0, tile_n)]  # (3, TN)
        if mxu:
            qp = lax.dot_general(
                qt, p, (((0,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # (TN, M)
            qn = jnp.sum(qt * qt, axis=0).reshape(tile_n, 1)
            # expansion form can go slightly negative at fp roundoff
            # (direct form is non-negative by construction); clamp so the
            # d2 >= 0 contract holds for inverse-distance weights.
            d2 = jnp.maximum((qn + pn) - 2.0 * qp, 0.0)
        else:
            qx = qt[0:1, :].reshape(tile_n, 1)
            qy = qt[1:2, :].reshape(tile_n, 1)
            qz = qt[2:3, :].reshape(tile_n, 1)
            d2 = (qx - px) ** 2 + (qy - py) ** 2 + (qz - pz) ** 2  # (TN, M)

        vals, idxs = [], []
        for _j in range(3):
            v = jnp.min(d2, axis=1, keepdims=True)  # (TN, 1)
            i = jnp.min(
                jnp.where(d2 == v, iota_m, M), axis=1, keepdims=True
            )
            d2 = jnp.where(iota_m == i, _BIG, d2)
            vals.append(v)
            idxs.append(i)
        dist_ref[0, pl.ds(n0, tile_n), :] = jnp.concatenate(vals, axis=1)
        idx_ref[0, pl.ds(n0, tile_n), :] = jnp.concatenate(idxs, axis=1)
        return 0

    lax.fori_loop(0, N // tile_n, tile_body, 0)


def _pick_tile(n: int) -> int:
    for t in (_TILE_N, 64, 32, 16, 8, 4, 2, 1):
        if n % t == 0:
            return t
    return 1


@functools.partial(jax.jit, static_argnames=("interpret", "mxu"))
def three_nn_pallas(
    query_xyz: jnp.ndarray, ref_xyz: jnp.ndarray, *, interpret: bool = False,
    mxu: bool = False,
):
    """(dists (B, N, 3) ascending, idx (B, N, 3) int32) — 3-NN of each query.

    ``mxu=True`` computes the distance tile via the expansion form with the
    cross term on the MXU instead of 8 VPU ops/element. Measured DEAD END
    (bench/threenn_ab.py on-chip, round 4): ~2x SLOWER at both flagship FP
    shapes (FP1 0.55 -> 1.08 ms, FP2 0.11 -> 0.16 ms) despite 0 off-tie
    index mismatches — a K=3 HIGHEST contraction wastes the systolic array
    and every (TN, M) product tile must move MXU->VPU before the extraction
    passes, which costs more than the 8 VPU ops/element it saves (same
    small-K economics as the round-3 fused-SA dead end). Kept opt-in as the
    measured negative result; the default stays the direct form.
    """
    B, N, _ = query_xyz.shape
    M = ref_xyz.shape[1]
    q = jnp.transpose(query_xyz.astype(jnp.float32), (0, 2, 1))  # (B, 3, N)
    p = jnp.transpose(ref_xyz.astype(jnp.float32), (0, 2, 1))  # (B, 3, M)
    tile_n = _pick_tile(N)

    return pl.pallas_call(
        functools.partial(_three_nn_kernel, tile_n=tile_n, mxu=mxu),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 3), jnp.int32),
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, M), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, N, 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(q, p)
