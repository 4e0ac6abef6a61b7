"""Grid-accelerated ball query: voxel binning + aligned-window scanning (v5).

The dense kernel (ballquery_pallas) is Theta(S*N*K) VPU-bound — every query
scans every point. This version bins points into a G^3 voxel grid with cell
size >= radius and sorts them by cell id (all XLA, outside the kernel), so
each tile of TQ spatially-adjacent queries only scans the points of its
27-cell neighborhood.

Design (v3 -> v4 evolution):
  * v2 computed, per query tile, the set of DISTINCT 128-aligned windows
    covering its neighborhood (sort + dedup + compaction + scatter on the
    XLA side) and a binary-search offsets table. That prep was a ~20-op
    serialized XLA chain costing more inside the train step than the kernel
    saved (measured +5.6 ms net at B=16, N=4096).
  * v3 deleted all of it using one observation: **reading extra windows is
    always correct** — every candidate is subjected to the exact radius
    test, and any point outside the true 27-neighborhood cannot pass it
    (cell size >= radius makes non-adjacent cells >= radius apart). Each
    dx-range reads R_W CONSECUTIVE aligned windows from ``r_start // WIN``;
    the only prep per tile is three ints. Ranges that spanned more than R_W
    windows fell back to the dense kernel for the WHOLE call via
    ``lax.cond``.
  * v4 makes the fallback PER-TILE and in-kernel: tiles whose ranges fit
    R_W windows take the narrow path; overflowing tiles rescan the full
    VMEM-resident point array inside the same kernel (``pl.when``), so
    results stay exact for any clustering while the common case pays only
    the 3*R_W*WIN-candidate scan. This removes the ``lax.cond`` (an XLA
    scheduling barrier) and lets R_W shrink from 4 to 3 — the K extraction
    passes dominate kernel time and scale with candidate width.
  * v5 attacks the remaining XLA-side prep: ONE multi-operand stable
    ``lax.sort`` carries the permutation and point coordinates as payloads
    (replacing argsort + three descriptor-bound re-gathers, ~0.6 ms), and
    the cell-offsets table moves into a small Pallas broadcast-compare
    kernel (replacing a 0.47 ms XLA compare-reduce with an awkward
    (B, H, N) predicate layout). Measured on-chip: standalone 2.94 ms at
    B=16/N=4096/S=1024/K=32 (vs 4.5 ms dense), flagship train step
    16.6 -> 15.8 ms.

Structure:
  * linear cell ids ``id = (cx*G + cy)*G + cz``; queries sorted by id, so a
    tile's query cells span [lo, hi] and its full 3x3x3 neighborhood is
    covered by THREE contiguous id ranges ``[lo + dx*G^2 - G - 1,
    hi + dx*G^2 + G + 1]``, dx in {-1,0,1} (the id gaps inside each range
    are same-x-slab cells far away in (y, z) — removed by the radius test).
  * the offsets table (first sorted position of each cell id) is ONE fused
    XLA compare-reduce over the sorted keys — O(H*N) brute force beats both
    ``jnp.searchsorted`` (8 ms lowering) and the hand-rolled binary search
    (12 serialized gather rounds) because it is a single fusion.
  * exactness: candidates carry ORIGINAL indices; selection is K passes of
    masked-min over ``score = where(in_radius, orig_idx, N)`` with
    value-retirement — which extracts ascending original indices AND
    retires all duplicate copies of a candidate at once, reproducing the
    reference's first-K-by-index + pad-with-first semantics bit-for-bit
    (model/pointnet_util.py::query_ball_point, SURVEY.md §2).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointnet12_tpu.kernels.ballquery_pallas import ballquery_pallas
from pointnet12_tpu.ops.gather import index_points

G = 8  # default grid resolution per dimension (8^3 = 512 cells)
H = G * G * G
TQ = 8  # queries per tile (== f32 sublane count; bounds the id span)
TB = 16  # tiles per grid step (TB*TQ = 128 query rows per step)
WIN = 128  # window width == Mosaic lane alignment
R_W = 3  # default consecutive aligned windows read per dx-range (3 ranges)


def _extract_first_k(score, nsample, n_total, rows):
    """K passes of masked-min with value retirement: ascending original
    indices, pad-with-first, duplicate copies retired at once. (int16
    scores would pack 2x per lane, but Mosaic has no int16 reductions —
    tried on-chip, NotImplementedError.)"""
    iota_k = lax.broadcasted_iota(jnp.int32, (rows, nsample), 1)

    def body(k, carry):
        score, out = carry
        w = jnp.min(score, axis=1, keepdims=True)
        out = jnp.where(iota_k == k, w, out)
        score = jnp.where(score == w, n_total, score)
        return score, out

    _, out = lax.fori_loop(
        0, nsample, body, (score, jnp.zeros((rows, nsample), jnp.int32))
    )
    first = out[:, :1]
    return jnp.where(out == n_total, first, out)


def _grid_kernel(
    blocks_ref, ovf_ref, q_ref, p_ref, oidx_ref, out_ref,
    *, radius, nsample, n_total, n_tiles, r_w=R_W,
):
    b = pl.program_id(0)
    tb = pl.program_id(1)
    r2 = radius * radius

    qxs, qys, qzs = [], [], []
    cxs, cys, czs, ois = [], [], [], []
    for tt in range(TB):
        qt = q_ref[0, tt]  # (3, TQ)
        qxs.append(qt[0:1, :].reshape(TQ, 1))
        qys.append(qt[1:2, :].reshape(TQ, 1))
        qzs.append(qt[2:3, :].reshape(TQ, 1))
        base = (b * n_tiles + tb * TB + tt) * 3
        xs, ys, zs, oo = [], [], [], []
        for rr in range(3):
            blk = blocks_ref[base + rr]
            for j in range(r_w):
                off = pl.multiple_of((blk + j) * WIN, WIN)
                pj = p_ref[0, :, pl.ds(off, WIN)]  # (3, WIN)
                xs.append(pj[0:1, :])
                ys.append(pj[1:2, :])
                zs.append(pj[2:3, :])
                oo.append(oidx_ref[0, 0:1, pl.ds(off, WIN)])
        cxs.append(jnp.concatenate(xs, axis=1))  # (1, 3*r_w*WIN)
        cys.append(jnp.concatenate(ys, axis=1))
        czs.append(jnp.concatenate(zs, axis=1))
        ois.append(jnp.concatenate(oo, axis=1))

    # stack TB tiles: queries (TB*TQ, 1), per-tile candidates broadcast to
    # their TQ query rows
    qx = jnp.concatenate(qxs, axis=0)  # (TB*TQ, 1)
    qy = jnp.concatenate(qys, axis=0)
    qz = jnp.concatenate(qzs, axis=0)
    cw = 3 * r_w * WIN
    cx = jnp.concatenate(
        [jnp.broadcast_to(c, (TQ, cw)) for c in cxs], axis=0
    )  # (TB*TQ, cw)
    cy = jnp.concatenate([jnp.broadcast_to(c, (TQ, cw)) for c in cys], axis=0)
    cz = jnp.concatenate([jnp.broadcast_to(c, (TQ, cw)) for c in czs], axis=0)
    oi = jnp.concatenate([jnp.broadcast_to(c, (TQ, cw)) for c in ois], axis=0)

    rows = TB * TQ
    d2 = (qx - cx) ** 2 + (qy - cy) ** 2 + (qz - cz) ** 2  # (rows, cw)
    score = jnp.where(d2 <= r2, oi, n_total)
    out_ref[0] = _extract_first_k(score, nsample, n_total, rows)

    # per-tile fallback: tiles whose id-ranges span more than R_W aligned
    # windows (degenerate clustering) rescan the FULL point array — already
    # VMEM-resident — and overwrite their TQ output rows. Exact for any
    # input; costs ~N/(3*R_W*WIN) of a tile's narrow-path work per
    # overflowing tile, so rare overflow is ~free and the whole-call
    # lax.cond fallback of v3 (an XLA scheduling barrier) is gone.
    x_all = p_ref[0, 0:1, :]  # (1, N)
    y_all = p_ref[0, 1:2, :]
    z_all = p_ref[0, 2:3, :]
    oi_all = oidx_ref[0, 0:1, :]

    def rescan(tt, _):
        @pl.when(ovf_ref[b * n_tiles + tb * TB + tt] != 0)
        def _():
            qt = q_ref[0, tt]  # (3, TQ)
            qx = qt[0:1, :].reshape(TQ, 1)
            qy = qt[1:2, :].reshape(TQ, 1)
            qz = qt[2:3, :].reshape(TQ, 1)
            d2 = (qx - x_all) ** 2 + (qy - y_all) ** 2 + (qz - z_all) ** 2
            score = jnp.where(d2 <= r2, oi_all, n_total)  # (TQ, N)
            out_ref[0, pl.ds(tt * TQ, TQ), :] = _extract_first_k(
                score, nsample, n_total, TQ
            )
        return 0

    lax.fori_loop(0, TB, rescan, 0)


_HPAD = 640  # default: H + 1 = 513 rounded up to a lane multiple


def _hpad_for(h: int) -> int:
    return -(-(h + 1) // WIN) * WIN


def _cell_offsets_kernel(skey_ref, out_ref, *, n_chunks, hpad):
    """counts[c] = #{i : skey[i] < c} via broadcast-compare accumulation:
    thresholds on sublanes (hpad, 1) against 128-lane skey chunks."""
    thr = lax.broadcasted_iota(jnp.int32, (hpad, 1), 0)
    acc = jnp.zeros((hpad, WIN), jnp.int32)
    for c in range(n_chunks):
        chunk = skey_ref[0, :, pl.ds(c * WIN, WIN)]  # (1, WIN)
        acc += (chunk < thr).astype(jnp.int32)
    out_ref[0] = jnp.sum(acc, axis=1, keepdims=True)  # (hpad, 1)


def _cell_offsets(
    skey: jnp.ndarray, *, h: int = H, interpret: bool = False
) -> jnp.ndarray:
    """offsets[b, c] = first position in sorted skey[b] with value >= c, for
    all c in [0, H] (padded to _HPAD; entries past H+1 are unused). The XLA
    compare-reduce form of this cost 0.47 ms/step at the flagship shape
    (awkward (B, H, N) pred layout); the Pallas broadcast-compare is ~10x
    less. jnp.searchsorted (8 ms lowering) and a vectorized binary search
    (12 serialized gather rounds, ~0.5 ms) both lose on v5e."""
    B, N = skey.shape
    hpad = _hpad_for(h)
    if N % WIN != 0:  # pragma: no cover - caller guarantees alignment
        c_range = jnp.arange(h + 1, dtype=jnp.int32)
        return jnp.sum(
            (skey[:, None, :] < c_range[None, :, None]).astype(jnp.int32),
            axis=-1,
        )
    out = pl.pallas_call(
        functools.partial(_cell_offsets_kernel, n_chunks=N // WIN, hpad=hpad),
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, hpad, 1), jnp.int32),
        in_specs=[
            pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, hpad, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(skey[:, None, :])
    return out[:, :, 0]


def _take1(arr2d, idx2d):
    """Fast batched 1-D gather: arr (B, N), idx (B, *S) -> (B, *S).

    Callers only pass sort/unsort permutation payloads, so indices are
    in [0, N) by construction; mode="clip" skips the oob select
    jnp.take's default mode="fill" would emit (see ops/gather.py)."""
    B, N = arr2d.shape
    flat = idx2d.reshape(B, -1).astype(jnp.int32)
    off = (jnp.arange(B, dtype=jnp.int32) * N)[:, None]
    out = jnp.take(
        arr2d.reshape(-1),
        (flat + off).reshape(-1),
        axis=0,
        mode="clip",
    )
    return out.reshape(idx2d.shape)


def grid_prep(radius, xyz, new_xyz, *, g_res=G, r_w=R_W, interpret=False):
    """XLA-side prep shared by the grid BQ kernel and the fused eval-SA
    kernel: voxel binning, cell-sort (payload-carrying), offsets table,
    per-tile window bases + overflow flags. Returns a dict; see body."""
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    T = S // TQ
    n_blocks = N // WIN

    h_cells = g_res * g_res * g_res
    lo = jnp.min(xyz, axis=1, keepdims=True)
    hi = jnp.max(xyz, axis=1, keepdims=True)
    extent = jnp.max(hi - lo, axis=-1, keepdims=True)
    g = jnp.maximum(extent / g_res, radius)  # cell size >= radius
    cell = jnp.clip(jnp.floor((xyz - lo) / g).astype(jnp.int32), 0, g_res - 1)
    key = (cell[..., 0] * g_res + cell[..., 1]) * g_res + cell[..., 2]
    # ONE multi-operand stable sort carries the permutation and the point
    # coordinates as payloads — the argsort-then-regather form cost ~0.6 ms
    # of descriptor-bound gathers + index math per step (profiled).
    iota_n = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    skey, perm, spx, spy, spz = lax.sort(
        (key, iota_n, xyz[..., 0], xyz[..., 1], xyz[..., 2]),
        dimension=1,
        is_stable=True,
        num_keys=1,
    )
    spT = jnp.stack([spx, spy, spz], axis=1)  # (B, 3, N) sorted points

    offsets = _cell_offsets(skey, h=h_cells, interpret=interpret)

    qcell = jnp.clip(
        jnp.floor((new_xyz - lo) / g).astype(jnp.int32), 0, g_res - 1
    )
    qkey = (qcell[..., 0] * g_res + qcell[..., 1]) * g_res + qcell[..., 2]
    iota_s = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
    sqkey, qperm, sqx, sqy, sqz = lax.sort(
        (qkey, iota_s, new_xyz[..., 0], new_xyz[..., 1], new_xyz[..., 2]),
        dimension=1,
        is_stable=True,
        num_keys=1,
    )
    sq_tiles = jnp.stack(
        [sqx.reshape(B, T, TQ), sqy.reshape(B, T, TQ), sqz.reshape(B, T, TQ)],
        axis=2,
    )  # (B, T, 3, TQ)

    tkey = sqkey.reshape(B, T, TQ)
    id_lo, id_hi = tkey[:, :, 0], tkey[:, :, TQ - 1]
    # one contiguous range per dx covering its dy/dz in {-1,0,1} sub-ranges
    dx_off = jnp.array([dx * g_res * g_res for dx in (-1, 0, 1)], jnp.int32)
    c_lo = jnp.clip(
        id_lo[:, :, None] + dx_off - g_res - 1, 0, h_cells - 1
    )  # (B, T, 3)
    c_hi = jnp.clip(id_hi[:, :, None] + dx_off + g_res + 1, 0, h_cells - 1)
    r_start = _take1(offsets, c_lo)
    r_end = _take1(offsets, c_hi + 1)

    # R_W consecutive windows from b_lo cover the range iff b_hi fits;
    # clamping b_lo down only ever ADDS earlier (harmless) windows, and at
    # the top clamp the covered span ends at n_blocks-1 >= any b_hi.
    b_lo = jnp.clip(r_start // WIN, 0, n_blocks - r_w)
    b_hi = jnp.maximum((r_end - 1) // WIN, 0)
    nonempty = r_end > r_start
    ovf = jnp.any(
        nonempty & (b_hi > b_lo + (r_w - 1)), axis=-1
    )  # (B, T) per-tile
    blocks = b_lo  # (B, T, 3)

    oidx = perm[:, None, :]  # (B, 1, N) original indices
    return {
        "blocks": blocks, "ovf": ovf, "sq_tiles": sq_tiles, "spT": spT,
        "oidx": oidx, "perm": perm, "qperm": qperm, "iota_s": iota_s,
        "sq_xyz": (sqx, sqy, sqz), "T": T,
    }


@functools.partial(
    jax.jit,
    static_argnames=("radius", "nsample", "g_res", "r_w", "interpret"),
)
def ballquery_grid(
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    *,
    g_res: int = G,
    r_w: int = R_W,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact ball query via voxel binning. Same contract as ballquery_pallas.

    ``g_res``/``r_w`` tune the grid resolution and the per-range window
    count; any combination is exact (radius test + per-tile rescan), the
    knobs are pure performance (see the round-3 sweep in PERFORMANCE.md)."""
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    if S % (TQ * TB) != 0 or N % WIN != 0 or N < r_w * WIN:
        return ballquery_pallas(
            radius, nsample, xyz, new_xyz, interpret=interpret
        )
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)
    g = grid_prep(
        radius, xyz, new_xyz, g_res=g_res, r_w=r_w, interpret=interpret
    )
    blocks, ovf, sq_tiles, spT, oidx, T = (
        g["blocks"], g["ovf"], g["sq_tiles"], g["spT"], g["oidx"], g["T"]
    )
    qperm, iota_s = g["qperm"], g["iota_s"]

    out_sorted = pl.pallas_call(
        functools.partial(
            _grid_kernel,
            radius=float(radius),
            nsample=nsample,
            n_total=N,
            n_tiles=T,
            r_w=r_w,
        ),
        grid=(B, T // TB),
        out_shape=jax.ShapeDtypeStruct((B, S, nsample), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # blocks, flat
            pl.BlockSpec(memory_space=pltpu.SMEM),  # per-tile overflow, flat
            pl.BlockSpec(
                (1, TB, 3, TQ),
                lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3, N), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, N), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, TB * TQ, nsample),
            lambda b, t: (b, t, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(
        blocks.reshape(-1),
        ovf.reshape(-1).astype(jnp.int32),
        sq_tiles,
        spT,
        oidx,
    )
    # unsort: inv[qperm[i]] = i via one payload sort (argsort of a perm)
    _, inv = lax.sort((qperm, iota_s), dimension=1, is_stable=True, num_keys=1)
    return index_points(out_sorted, inv)
