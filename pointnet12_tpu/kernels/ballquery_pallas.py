"""Pallas TPU kernel for fixed-K ball query.

Reference cost model (SURVEY.md §3.2): the reference materializes a
``(B, S, N)`` squared-distance matrix in HBM and full-sorts along N. Here
each grid step processes one cloud: distance tiles of 128 query centers are
computed and consumed entirely in VMEM (the ``(B, S, N)`` matrix never
touches HBM), and the first-K-by-index selection runs as K masked-min
extractions over the VMEM-resident score tile.

Semantics are identical to :func:`pointnet12_tpu.ops.ballquery._ballquery_jnp`
(first K in-radius points by index, ascending, padded with the first): the
k-th extraction takes the row minimum of ``score = where(in_radius, idx, N)``
and then retires it, so winners emerge in ascending index order.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(s: int) -> int:
    """Largest query-tile size <= 128 that divides S (model S are powers of 2)."""
    for t in (128, 64, 32, 16, 8, 4, 2, 1):
        if s % t == 0:
            return t
    return 1


def _ballquery_kernel(q_ref, p_ref, out_ref, *, radius, nsample, tile_s):
    _, _, S = q_ref.shape
    N = p_ref.shape[2]
    p = p_ref[0]  # (3, N)
    x, y, z = p[0:1, :], p[1:2, :], p[2:3, :]  # (1, N)
    iota_n = lax.broadcasted_iota(jnp.int32, (tile_s, N), 1)
    iota_k = lax.broadcasted_iota(jnp.int32, (tile_s, nsample), 1)
    r2 = radius * radius

    def tile_body(t, _):
        s0 = t * tile_s
        qt = q_ref[0, :, pl.ds(s0, tile_s)]  # (3, TS)
        qx = qt[0:1, :].reshape(tile_s, 1)
        qy = qt[1:2, :].reshape(tile_s, 1)
        qz = qt[2:3, :].reshape(tile_s, 1)
        d2 = (qx - x) ** 2 + (qy - y) ** 2 + (qz - z) ** 2  # (TS, N)
        score0 = jnp.where(d2 <= r2, iota_n, N)

        def body(k, carry):
            score, out = carry
            w = jnp.min(score, axis=1, keepdims=True)  # k-th winner per row
            out = jnp.where(iota_k == k, w, out)
            score = jnp.where(score == w, N, score)  # retire the winner
            return score, out

        init = (score0, jnp.zeros((tile_s, nsample), jnp.int32))
        _, out = lax.fori_loop(0, nsample, body, init)
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
