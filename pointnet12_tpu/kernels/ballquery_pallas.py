"""Pallas TPU kernel for fixed-K ball query.

Reference cost model (SURVEY.md §3.2): the reference materializes a
``(B, S, N)`` squared-distance matrix in HBM and full-sorts along N. Here
each grid step processes one cloud: distance tiles of 128 query centers are
computed and consumed entirely in VMEM (the ``(B, S, N)`` matrix never
touches HBM).

Selection algorithm (exact first-K-by-index semantics, no sort):
  1. ``mask = d2 <= r^2`` per tile.
  2. inclusive prefix-sum ``rank`` of the mask along N — computed ON THE MXU
     as a matmul with a lower-triangular ones matrix per 128-wide chunk plus
     a tiny chunk-offset fixup (Mosaic has no cumsum primitive, and a
     Kogge-Stone VPU scan would cost ~24 full passes; the MXU does it in
     ~1.3 us/tile).
  3. the k-th output is the POSITION of the (k+1)-th set bit, which for an
     inclusive prefix equals ``sum_n [rank[n] <= k]`` — K cheap
     compare+count passes, no data-dependent extraction chain.
  4. positions that don't exist (fewer than K in-radius) count to exactly N
     and are replaced by the first column (reference pad-with-first).

Measured on v5e at B=16, S=1024, N=4096, K=32: 4.5 ms vs 5.8 ms for the
iterative masked-min version and 32.4 ms for the XLA top_k path.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 128  # prefix-sum chunk == MXU width


def _pick_tile(s: int) -> int:
    """Largest query-tile size <= 128 that divides S (model S are powers of 2)."""
    for t in (128, 64, 32, 16, 8, 4, 2, 1):
        if s % t == 0:
            return t
    return 1


def _inclusive_rank(mask: jnp.ndarray, tile_s: int, n: int) -> jnp.ndarray:
    """Inclusive prefix-sum along axis 1 via MXU matmuls. mask: (TS, N) f32."""
    if n % _CHUNK != 0:
        # small N fallback: one triangular matmul over the whole row
        tri = (
            lax.broadcasted_iota(jnp.int32, (n, n), 0)
            <= lax.broadcasted_iota(jnp.int32, (n, n), 1)
        ).astype(jnp.float32)
        return jnp.dot(mask, tri, preferred_element_type=jnp.float32)
    c = n // _CHUNK
    tri = (
        lax.broadcasted_iota(jnp.int32, (_CHUNK, _CHUNK), 0)
        <= lax.broadcasted_iota(jnp.int32, (_CHUNK, _CHUNK), 1)
    ).astype(jnp.float32)  # tri[j, i] = [j <= i]
    pref = jnp.dot(
        mask.reshape(tile_s * c, _CHUNK), tri,
        preferred_element_type=jnp.float32,
    ).reshape(tile_s, c, _CHUNK)
    totals = pref[:, :, _CHUNK - 1]  # (TS, C)
    tri_excl = (
        lax.broadcasted_iota(jnp.int32, (c, c), 0)
        < lax.broadcasted_iota(jnp.int32, (c, c), 1)
    ).astype(jnp.float32)
    offs = jnp.dot(totals, tri_excl, preferred_element_type=jnp.float32)
    return (pref + offs[:, :, None]).reshape(tile_s, n)


def _ballquery_kernel(q_ref, p_ref, out_ref, *, radius, nsample, tile_s):
    _, _, S = q_ref.shape
    N = p_ref.shape[2]
    p = p_ref[0]  # (3, N)
    x, y, z = p[0:1, :], p[1:2, :], p[2:3, :]
    iota_k = lax.broadcasted_iota(jnp.int32, (tile_s, nsample), 1)
    r2 = radius * radius

    def tile_body(t, _):
        s0 = t * tile_s
        qt = q_ref[0, :, pl.ds(s0, tile_s)]  # (3, TS)
        qx = qt[0:1, :].reshape(tile_s, 1)
        qy = qt[1:2, :].reshape(tile_s, 1)
        qz = qt[2:3, :].reshape(tile_s, 1)
        d2 = (qx - x) ** 2 + (qy - y) ** 2 + (qz - z) ** 2  # (TS, N)
        mask = (d2 <= r2).astype(jnp.float32)
        rank = _inclusive_rank(mask, tile_s, N)

        def body(k, out):
            p_k = jnp.sum(
                (rank <= k).astype(jnp.int32), axis=1, keepdims=True
            )
            return jnp.where(iota_k == k, p_k, out)

        out = lax.fori_loop(
            0, nsample, body, jnp.zeros((tile_s, nsample), jnp.int32)
        )
        first = out[:, :1]
        out_ref[0, pl.ds(s0, tile_s), :] = jnp.where(out == N, first, out)
        return 0

    lax.fori_loop(0, S // tile_s, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("radius", "nsample", "interpret"))
def ballquery_pallas(
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, S, nsample) int32 group indices; see module docstring."""
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    p = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))  # (B, 3, N)
    q = jnp.transpose(new_xyz.astype(jnp.float32), (0, 2, 1))  # (B, 3, S)
    tile_s = _pick_tile(S)

    return pl.pallas_call(
        functools.partial(
            _ballquery_kernel,
            radius=float(radius),
            nsample=nsample,
            tile_s=tile_s,
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, nsample), jnp.int32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, S), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, S, nsample), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(q, p)
