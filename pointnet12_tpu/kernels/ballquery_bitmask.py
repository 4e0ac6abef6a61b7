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
     (Direct-form VPU distances: routing the cross term through an MXU
     ``(TS,3)x(3,N)`` HIGHEST matmul was tried and measured 2.2x SLOWER
     kernel-wide — 1.65 vs 0.76 ms at SA1 — the K=3 contraction wastes
     whole MXU passes; recorded as a dead end in docs/PERFORMANCE.md.)
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
at every shape; the dense kernel is the cross-session anchor — it held
4.40-4.57 ms across every session below):

    shape                       bitmask      dense       grid v5
    SA1  N=4096 S=1024 K=32     1.11-1.30*   4.40-4.57   1.74-2.03  ms
    SA2  N=1024 S=256  K=32     0.15-0.20    0.27-0.35   0.43
    SA3  N=256  S=64   K=32     0.057        0.018       —
    MSG  N=4096 S=512  K=64     1.09         4.16        14.27

    * one early session read 0.764 — never replicated across four later
      compiles (1.11/1.14/1.26/1.30); treated as this box's documented
      favorable-draw band, not the expected value.

~1.6-1.8x over the grid kernel at the flagship shape (plus the grid's
XLA-side prep leaves the step entirely) and 3.8x over dense at the MSG
wide-K shape: extraction passes dominate every ball-query kernel, and
this one runs them on 16x less data. The binding end-to-end number is
the same-process flagship step A/B: 15.92 -> 14.61 ms
(bench/bitmask_step_ab.py). Dense keeps N < 1024 (the word lanes run
underfull); above N=4096 packing switches to n_chunk-wide slabs to stay
under the 16 MB scoped-VMEM limit (`ops/ballquery.py` dispatch table).
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
    lane16 = (
        lax.broadcasted_iota(jnp.int32, (tile_s, n_total // _BITS), 1) * _BITS
    )
    return iota_k, lane16


def _tile_out(qt, rows, n_total, pk, iotas, *, radius, nsample, tile_s):
    """One query tile: (3, TS) centers + per-chunk point rows -> (TS, K)."""
    N = n_total
    r2 = radius * radius
    iota_k, lane16 = iotas
    qx = qt[0:1, :].reshape(tile_s, 1)
    qy = qt[1:2, :].reshape(tile_s, 1)
    qz = qt[2:3, :].reshape(tile_s, 1)
    # pack per n_chunk-wide slice: the block-diagonal structure of the
    # full (N, N/16) pack matrix repeats every n_chunk columns, so one
    # (n_chunk, n_chunk/16) matrix serves every chunk and the (TS, N)
    # distance tile never materializes at once (VMEM: the single-slab
    # form OOMs the 16 MB scoped limit at N=8192).
    blocks = []
    for x, y, z in rows:
        d2 = (qx - x) ** 2 + (qy - y) ** 2 + (qz - z) ** 2  # (TS, n_chunk)
        mask = (d2 <= r2).astype(jnp.bfloat16)
        blocks.append(jnp.dot(mask, pk, preferred_element_type=jnp.float32))
    words = (
        jnp.concatenate(blocks, axis=1) if len(blocks) > 1 else blocks[0]
    ).astype(jnp.int32)  # (TS, W) — exact, sums < 2^16

    def sel(k, carry):
        w, out = carry
        iso = w & (-w)
        pos = (
            lax.bitcast_convert_type(iso.astype(jnp.float32), jnp.int32)
            >> 23
        ) - 127
        g = jnp.where(w == 0, N, lane16 + pos)
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
    Requires ``N % 16 == 0``; callers dispatch elsewhere otherwise.
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
    pk = _pack_matrix(n_chunk)
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
                    (n_chunk, n_chunk // _BITS),
                    lambda b, t: (0, 0),
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
