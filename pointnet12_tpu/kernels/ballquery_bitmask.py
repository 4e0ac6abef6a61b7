"""Bitmask ball query: MXU bit-packing + lowest-set-bit extraction.

Third ball-query strategy next to the dense prefix-rank kernel
(ballquery_pallas) and the voxel-grid kernel (ballquery_grid). Both
existing kernels are bound by their K extraction passes, each of which
touches every candidate column per selected neighbor:

  * dense:  K passes of ``sum([rank <= k])`` over (TS, N)    — N=4096 wide
  * grid:   K masked-min passes over (TS, 3*R_W*128=1152) candidates

This kernel compresses the in-radius mask 32:1 BEFORE extraction, so the
K sequential passes run on (TS, N/32) int32 words instead:

  1. ``mask = d2 <= r^2`` per 128-query tile, like the dense kernel.
     (Direct-form VPU distances: routing the cross term through an MXU
     ``(TS,3)x(3,N)`` HIGHEST matmul was tried and measured 2.2x SLOWER
     kernel-wide — 1.65 vs 0.76 ms at SA1 — the K=3 contraction wastes
     whole MXU passes; recorded as a dead end in docs/PERFORMANCE.md.)
  2. **bit-pack on the MXU**: ``lo = mask @ P_lo``, ``hi = mask @ P_hi``
     with static matrices ``P_lo[n, w] = 2^(n mod 32) * [n div 32 == w,
     n mod 32 < 16]`` and ``P_hi`` covering bits 16-31 (weights
     ``2^(n mod 32 - 16)``); ``word = lo | hi << 16``. All matmul inputs
     (0/1 and powers of two) are exact in bf16 and every column sums
     below 2^16, so stock bf16 matmuls with f32 accumulation pack
     EXACTLY — bit j of word w is point ``32w + j``'s in-radius flag.
     The hi/lo split exists because a single 32-bit-weight matmul would
     need f32 to represent sums up to 2^32-1 exactly, which it cannot;
     two half-width matmuls cost the same MXU FLOPs as the round-3 v1
     kernel's single 16-bit pack while HALVING the word-lane count every
     extraction pass runs over (v1 packed 16 bits/word to dodge exactly
     this; the shift-or assembly step was the missing piece).
  3. **extract first-K-by-index** (reference semantics, SURVEY.md §2:
     ascending ORIGINAL index, NOT k-nearest): K iterations of
        iso = w & -w                      # lowest set bit per word
        pos = exponent(float(iso))        # bit position via f32 bitcast
        pos = where(iso < 0, 31, pos)     # bit 31: int32 convert invalid
        g   = where(w == 0, N, 32*lane + pos)
        m   = min(g, axis=lanes)          # k-th neighbor index
        w   = where(g == m, w ^ iso, w)   # clear exactly that bit
     Each iteration runs on N/32 lanes of int32 — 32x less data than a
     dense pass (at the SA1 flagship shape, N=4096 -> 128 words: exactly
     one vreg row) — and needs no data-dependent extraction chain: ``g``
     is unique per lane, so the clear needs no argmin gather (Mosaic has
     no dynamic gather; that wall killed the fused eval-SA kernels, see
     docs/PERFORMANCE.md round-3 dead ends).
  4. slots past the in-radius count see ``m == N`` and are replaced by
     the first column (reference pad-with-first).

The float-exponent trick is exact: ``iso`` is 0 or a single power of two;
int32 -> f32 conversion of powers of two up to 2^30 is exact and
``(bits >> 23) - 127`` reads the unbiased exponent. The two invalid
cases are both masked: ``iso == 0`` (pos = -127) by the ``w == 0`` guard,
and ``iso == 1<<31`` (negative int32, nonsense after conversion) by the
explicit ``iso < 0 -> 31`` select.

Unlike the grid kernel there is NO XLA-side prep (no sorts, no offsets
table, no unsort gather) — the call is a single pallas_call, which also
removes the prep's serialization inside the train step.

Measured standalone on v5e (bench/bitmask_ab.py, on-chip verified exact
at every shape; the dense kernel is the cross-session anchor):

    shape                       v2 (32-bit)  v1 (16-bit)  dense       grid v5
    SA1  N=4096 S=1024 K=32     **1.024**    1.11-1.30*   4.40-4.57   1.74-2.16
    SA2  N=1024 S=256  K=32     **0.143**    0.15-0.20    0.27-0.35   0.43-0.50
    SA3  N=256  S=64   K=32     0.036        0.057        0.018-0.045 —
    MSG  N=4096 S=512  K=64     **0.872**    1.09         4.16-4.26   14.27-14.33

    (v2 session anchors: dense 4.551 / 0.311 / 0.045 / 4.257.)
    * one early v1 session read 0.764 — never replicated across four
      later compiles (1.11/1.14/1.26/1.30); treated as this box's
      documented favorable-draw band, not the expected value.

The v2 32-bit packing (round-3 continuation) halves the word-lane count
of every extraction pass — at SA1 the words fit exactly one vreg row —
for 8-25% kernel-level gains over v1 (the distance+pack phase, which
packing width does not change, bounds the rest). ~2x over the grid
kernel at the flagship shape (plus the grid's XLA-side prep leaves the
step entirely) and 4.9x over dense at the MSG wide-K shape. Dense keeps
N < 1024: SA3's 0.036-vs-0.045 reading is inside this box's micro-kernel
session noise (the v1 session measured the same dense kernel at 0.018
same-process) and worth <=0.02 ms/step, so the crossover stays put.
Above N=4096 packing switches to n_chunk-wide slabs to stay under the
16 MB scoped-VMEM limit (`ops/ballquery.py` dispatch table).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointnet12_tpu.kernels.ballquery_pallas import _pick_tile

_BITS = 32  # bits packed per int32 word (hi/lo halves keep matmuls exact)


def _pack_matrices(n: int) -> jnp.ndarray:
    """(2, N, N/32) bf16, stacked [P_lo, P_hi]:

    P_lo[n, w] = 2^(n%32)      iff n//32 == w and n%32 < 16
    P_hi[n, w] = 2^(n%32 - 16) iff n//32 == w and n%32 >= 16

    Each column sums below 2^16, so bf16 matmuls with f32 accumulation
    are exact; ``word = lo | hi << 16`` assembles the 32-bit mask word.
    """
    w = n // _BITS
    rows = lax.broadcasted_iota(jnp.int32, (n, w), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n, w), 1)
    bit = rows % _BITS
    own = rows // _BITS == cols
    lo = jnp.where(own & (bit < 16), jnp.exp2(bit.astype(jnp.float32)), 0.0)
    hi = jnp.where(
        own & (bit >= 16), jnp.exp2((bit - 16).astype(jnp.float32)), 0.0
    )
    return jnp.stack([lo, hi]).astype(jnp.bfloat16)


def _chunk_rows(p, n_chunk):
    """Pre-slice (3, N) into per-chunk (1, n_chunk) coordinate rows ONCE per
    program — Mosaic does not hoist loop-invariant slices out of fori_loop
    bodies (same-process: 1.295 ms unhoisted vs 1.217 hoisted at SA1)."""
    N = p.shape[1]
    return [
        (
            p[0:1, c * n_chunk : (c + 1) * n_chunk],
            p[1:2, c * n_chunk : (c + 1) * n_chunk],
            p[2:3, c * n_chunk : (c + 1) * n_chunk],
        )
        for c in range(N // n_chunk)
    ]


def _iotas(n_total, tile_s, nsample):
    """Loop-invariant index planes, built ONCE per program: Mosaic does not
    hoist invariant code out of fori_loop bodies (measured with the chunk
    row slices; see _chunk_rows)."""
    iota_k = lax.broadcasted_iota(jnp.int32, (tile_s, nsample), 1)
    lane32 = (
        lax.broadcasted_iota(jnp.int32, (tile_s, n_total // _BITS), 1) * _BITS
    )
    return iota_k, lane32


def _tile_out(qt, rows, n_total, pk, iotas, *, radius, nsample, tile_s):
    """One query tile: (3, TS) centers + per-chunk point rows -> (TS, K)."""
    N = n_total
    r2 = radius * radius
    iota_k, lane32 = iotas
    qx = qt[0:1, :].reshape(tile_s, 1)
    qy = qt[1:2, :].reshape(tile_s, 1)
    qz = qt[2:3, :].reshape(tile_s, 1)
    # pack per n_chunk-wide slice: the block-diagonal structure of the
    # full (N, N/32) pack matrices repeats every n_chunk columns, so one
    # (n_chunk, n_chunk/32) hi/lo pair serves every chunk and the (TS, N)
    # distance tile never materializes at once (VMEM: the single-slab
    # form OOMs the 16 MB scoped limit at N=8192).
    pk_lo, pk_hi = pk[0], pk[1]
    blocks = []
    for x, y, z in rows:
        d2 = (qx - x) ** 2 + (qy - y) ** 2 + (qz - z) ** 2  # (TS, n_chunk)
        mask = (d2 <= r2).astype(jnp.bfloat16)
        lo = jnp.dot(mask, pk_lo, preferred_element_type=jnp.float32)
        hi = jnp.dot(mask, pk_hi, preferred_element_type=jnp.float32)
        blocks.append(lo.astype(jnp.int32) | (hi.astype(jnp.int32) << 16))
    words = (
        jnp.concatenate(blocks, axis=1) if len(blocks) > 1 else blocks[0]
    )  # (TS, W) int32 — exact: each half summed < 2^16 before the shift-or

    def sel(k, carry):
        w, out = carry
        iso = w & (-w)
        pos = (
            lax.bitcast_convert_type(iso.astype(jnp.float32), jnp.int32)
            >> 23
        ) - 127
        # bit 31: iso is INT32_MIN, whose f32 conversion is negative and
        # the exponent read above nonsense — select the position directly
        pos = jnp.where(iso < 0, 31, pos)
        g = jnp.where(w == 0, N, lane32 + pos)
        m = jnp.min(g, axis=1, keepdims=True)  # (TS, 1)
        out = jnp.where(iota_k == k, m, out)
        w = jnp.where(g == m, w ^ iso, w)
        return w, out

    _, out = lax.fori_loop(
        0, nsample, sel, (words, jnp.zeros((tile_s, nsample), jnp.int32))
    )
    first = out[:, :1]
    return jnp.where(out == N, first, out)


def _kernel_1d(q_ref, p_ref, pk_ref, out_ref, *, radius, nsample, tile_s, n_chunk):
    """grid=(B,): one program per cloud, fori over query tiles."""
    S = q_ref.shape[2]
    N = p_ref.shape[2]
    rows = _chunk_rows(p_ref[0], n_chunk)
    pk = pk_ref[:]
    iotas = _iotas(N, tile_s, nsample)

    def tile_body(t, _):
        s0 = t * tile_s
        qt = q_ref[0, :, pl.ds(s0, tile_s)]  # (3, TS)
        out_ref[0, pl.ds(s0, tile_s), :] = _tile_out(
            qt, rows, N, pk, iotas,
            radius=radius, nsample=nsample, tile_s=tile_s,
        )
        return 0

    lax.fori_loop(0, S // tile_s, tile_body, 0)


def _kernel_2d(q_ref, p_ref, pk_ref, out_ref, *, radius, nsample, tile_s, n_chunk):
    """grid=(B, T): one program per query tile — smaller q/out blocks let
    Pallas double-buffer their DMA against neighboring tiles' compute."""
    N = p_ref.shape[2]
    out_ref[0] = _tile_out(
        q_ref[0], _chunk_rows(p_ref[0], n_chunk), N, pk_ref[:],
        _iotas(N, tile_s, nsample),
        radius=radius, nsample=nsample, tile_s=tile_s,
    )


@functools.partial(
    jax.jit, static_argnames=("radius", "nsample", "interpret", "tiled_grid")
)
def ballquery_bitmask(
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    *,
    interpret: bool = False,
    tiled_grid: bool = True,
) -> jnp.ndarray:
    """(B, S, nsample) int32 group indices; see module docstring.

    Same contract as ballquery_pallas (first-K-by-index, pad-with-first).
    Requires ``N % 32 == 0`` (32 bits per packed word); callers dispatch
    elsewhere otherwise.
    ``tiled_grid=True`` (default) runs a (B, S/tile) grid — one program
    per query tile, letting Pallas double-buffer the small q/out blocks;
    measured mildly but consistently faster than the (B,) grid + in-kernel
    tile loop (SA1: 1.11/1.14 vs 1.26/1.30 ms across two sessions).
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
    pk = _pack_matrices(n_chunk)  # (2, n_chunk, n_chunk/32) [lo, hi]
    tile_s = _pick_tile(S)

    kw = dict(
        radius=float(radius), nsample=nsample, tile_s=tile_s, n_chunk=n_chunk
    )
    if tiled_grid:
        return pl.pallas_call(
            functools.partial(_kernel_2d, **kw),
            out_shape=jax.ShapeDtypeStruct((B, S, nsample), jnp.int32),
            grid=(B, S // tile_s),
            in_specs=[
                pl.BlockSpec(
                    (1, 3, tile_s), lambda b, t: (b, 0, t),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 3, N), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (2, n_chunk, n_chunk // _BITS),
                    lambda b, t: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, tile_s, nsample),
                lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
            interpret=interpret,
        )(q, p, pk)
    return pl.pallas_call(
        functools.partial(_kernel_1d, **kw),
        out_shape=jax.ShapeDtypeStruct((B, S, nsample), jnp.int32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, S), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (2, n_chunk, n_chunk // _BITS),
                lambda b: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, S, nsample), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(q, p, pk)
