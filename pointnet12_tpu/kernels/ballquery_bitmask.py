"""Bitmask ball query: MXU bit-packing + lowest-set-bit extraction.

Third ball-query strategy next to the dense prefix-rank kernel
(ballquery_pallas) and the voxel-grid kernel (ballquery_grid). Both
existing kernels are bound by their K extraction passes, each of which
touches every candidate column per selected neighbor:

  * dense:  K passes of ``sum([rank <= k])`` over (TS, N)    — N=4096 wide
  * grid:   K masked-min passes over (TS, 3*R_W*128=1152) candidates

This kernel compresses the in-radius mask 16:1 BEFORE extraction, so the
K sequential passes run on (TS, N/16) int32 words instead:

  1. ``mask = d2 <= r^2`` per 128-query tile, like the dense kernel.
  2. **bit-pack on the MXU**: ``words = mask @ P`` with the static matrix
     ``P[n, w] = 2^(n mod 16) * [n div 16 == w]``. All inputs (0/1 and
     powers of two) are exact in bf16 and every word sums below 2^16, so
     a stock bf16 matmul with f32 accumulation packs EXACTLY — bit j of
     word w is point ``16w + j``'s in-radius flag. 16 bits per lane (not
     32) keeps sums inside f32's exact-integer range and away from the
     int32 sign bit.
  3. **extract first-K-by-index** (reference semantics, SURVEY.md §2:
     ascending ORIGINAL index, NOT k-nearest): K iterations of
        iso = w & -w                      # lowest set bit per word
        pos = exponent(float(iso))        # bit position via f32 bitcast
        g   = where(w == 0, N, 16*lane + pos)
        m   = min(g, axis=lanes)          # k-th neighbor index
        w   = where(g == m, w ^ iso, w)   # clear exactly that bit
     Each iteration runs on N/16 lanes of int32 — 16x less data than a
     dense pass — and needs no data-dependent extraction chain: ``g`` is
     unique per lane, so the clear needs no argmin gather (Mosaic has no
     dynamic gather; that wall killed the fused eval-SA kernels, see
     docs/PERFORMANCE.md round-3 dead ends).
  4. slots past the in-radius count see ``m == N`` and are replaced by
     the first column (reference pad-with-first).

The float-exponent trick is exact: ``iso`` is 0 or a power of two below
2^16, both exactly converted to f32, and ``(bits >> 23) - 127`` reads the
unbiased exponent. ``iso == 0`` gives pos = -127 but is masked by the
``w == 0`` guard.

Unlike the grid kernel there is NO XLA-side prep (no sorts, no offsets
table, no unsort gather) — the call is a single pallas_call, which also
removes the prep's serialization inside the train step.

Measured standalone on v5e (bench/bitmask_ab.py, on-chip verified exact
at every shape):

    shape                       bitmask   dense   grid v5
    SA1  N=4096 S=1024 K=32     0.764     4.402   2.032    ms
    SA2  N=1024 S=256  K=32     0.195     0.269   0.431
    SA3  N=256  S=64   K=32     0.057     0.018   —
    MSG  N=4096 S=512  K=64     1.092     4.157   14.267

2.7x over the grid kernel at the flagship shape and 3.8x over dense at
the MSG wide-K shape: extraction passes dominate every ball-query
kernel, and this one runs them on 16x less data. Dense keeps N < 1024
(the word lanes run underfull); the single-pass pack matrix exceeds the
16 MB scoped-VMEM limit at N=8192, where the grid kernel still serves
(`ops/ballquery.py` dispatch table).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointnet12_tpu.kernels.ballquery_pallas import _pick_tile

_BITS = 16  # bits packed per int32 word (f32-exact matmul accumulation)


def _pack_matrix(n: int) -> jnp.ndarray:
    """(N, N/16) bf16: P[n, w] = 2^(n%16) iff n//16 == w else 0."""
    w = n // _BITS
    rows = lax.broadcasted_iota(jnp.int32, (n, w), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n, w), 1)
    weight = jnp.exp2((rows % _BITS).astype(jnp.float32))
    return jnp.where(rows // _BITS == cols, weight, 0.0).astype(jnp.bfloat16)


def _ballquery_bitmask_kernel(
    q_ref, p_ref, pk_ref, out_ref, *, radius, nsample, tile_s, n_chunk
):
    S = q_ref.shape[2]
    N = p_ref.shape[2]
    W = N // _BITS
    p = p_ref[0]  # (3, N)
    pk = pk_ref[:]  # (n_chunk, n_chunk/16) bf16, reused per chunk
    r2 = radius * radius
    iota_k = lax.broadcasted_iota(jnp.int32, (tile_s, nsample), 1)
    lane16 = lax.broadcasted_iota(jnp.int32, (tile_s, W), 1) * _BITS

    def tile_body(t, _):
        s0 = t * tile_s
        qt = q_ref[0, :, pl.ds(s0, tile_s)]  # (3, TS)
        qx = qt[0:1, :].reshape(tile_s, 1)
        qy = qt[1:2, :].reshape(tile_s, 1)
        qz = qt[2:3, :].reshape(tile_s, 1)
        # pack per n_chunk-wide slice: the block-diagonal structure of the
        # full (N, N/16) pack matrix repeats every n_chunk columns, so one
        # (n_chunk, n_chunk/16) matrix serves every chunk and the (TS, N)
        # distance tile never materializes at once (VMEM: the single-slab
        # form OOMs the 16 MB scoped limit at N=8192).
        blocks = []
        for c in range(N // n_chunk):
            sl = slice(c * n_chunk, (c + 1) * n_chunk)
            d2 = (
                (qx - p[0:1, sl]) ** 2
                + (qy - p[1:2, sl]) ** 2
                + (qz - p[2:3, sl]) ** 2
            )  # (TS, n_chunk)
            mask = (d2 <= r2).astype(jnp.bfloat16)
            blocks.append(
                jnp.dot(mask, pk, preferred_element_type=jnp.float32)
            )
        words = (
            jnp.concatenate(blocks, axis=1) if len(blocks) > 1 else blocks[0]
        ).astype(jnp.int32)  # (TS, W) — exact, sums < 2^16

        def sel(k, carry):
            w, out = carry
            iso = w & (-w)
            pos = (
                lax.bitcast_convert_type(
                    iso.astype(jnp.float32), jnp.int32
                )
                >> 23
            ) - 127
            g = jnp.where(w == 0, N, lane16 + pos)
            m = jnp.min(g, axis=1, keepdims=True)  # (TS, 1)
            out = jnp.where(iota_k == k, m, out)
            w = jnp.where(g == m, w ^ iso, w)
            return w, out

        _, out = lax.fori_loop(
            0,
            nsample,
            sel,
            (words, jnp.zeros((tile_s, nsample), jnp.int32)),
        )
        first = out[:, :1]
        out_ref[0, pl.ds(s0, tile_s), :] = jnp.where(out == N, first, out)
        return 0

    lax.fori_loop(0, S // tile_s, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("radius", "nsample", "interpret"))
def ballquery_bitmask(
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, S, nsample) int32 group indices; see module docstring.

    Same contract as ballquery_pallas (first-K-by-index, pad-with-first).
    Requires ``N % 16 == 0``; callers dispatch elsewhere otherwise.
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    if N % _BITS != 0:
        raise ValueError(f"ballquery_bitmask needs N % {_BITS} == 0, got {N}")
    # single-slab packing up to N=4096; chunked above (VMEM, see kernel)
    n_chunk = N
    if N > 4096:
        for cand in (4096, 2048, 1024, 512, 256, 128):
            if N % cand == 0:
                n_chunk = cand
                break
        else:
            raise ValueError(
                f"ballquery_bitmask needs a pow2 chunk divisor <= 4096 for "
                f"N > 4096, got N={N}"
            )
    p = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))  # (B, 3, N)
    q = jnp.transpose(new_xyz.astype(jnp.float32), (0, 2, 1))  # (B, 3, S)
    pk = _pack_matrix(n_chunk)
    tile_s = _pick_tile(S)

    return pl.pallas_call(
        functools.partial(
            _ballquery_bitmask_kernel,
            radius=float(radius),
            nsample=nsample,
            tile_s=tile_s,
            n_chunk=n_chunk,
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, nsample), jnp.int32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, S), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (n_chunk, n_chunk // _BITS),
                lambda b: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, S, nsample), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(q, p, pk)
