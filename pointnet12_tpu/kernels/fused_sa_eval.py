"""Fused eval-mode set-abstraction kernel (serving fast path).

Reference behavior: PointNetSetAbstraction eval forward = ball query ->
grouped gather -> (BN-folded) shared-MLP chain -> K-max -> ReLU
(model/pointnet_util.py::PointNetSetAbstraction, SURVEY.md §2/§3.2). The
unfused TPU path runs these as separate XLA ops, so the grouped
``(B, S, K, C)`` activations round-trip HBM between every stage and the
group gather is a descriptor-bound 0.9 ms per 512K rows.

This kernel does the whole layer in ONE pallas_call — the grouped tensor
never exists outside VMEM:

  1. distances + in-radius mask per 128-query tile (never materializing
     ``(B, S, N)``), inclusive prefix-rank on the MXU (the dense-BQ trick,
     kernels/ballquery_pallas.py),
  2. selection-by-rank: the k-th selected neighbor's ONE-HOT row over the N
     candidates is ``(rank == k+1) & mask`` — already a byproduct of the
     rank computation — so the group GATHER becomes a (TS, N) x (N, C1)
     MXU matmul per k. An appended ones-column yields the selection count,
     which implements the reference's pad-with-first (count==0 rows reuse
     the k=0 row). First-K-by-index semantics hold exactly because
     candidates are scanned in index order.
  3. the folded MLP chain (eval BN rides the matmul columns, see
     nn/mlp.py::_folded_dense_bn) over the VMEM-resident (K*TS, C) rows,
  4. K-max pool (pre-ReLU, commutes) + final ReLU, writing only the pooled
     ``(TS, C_out)`` tile.

Numerics: h1 = w[idx] - t with ``w = pts @ W0f + b0f`` / ``t = q @ W0f[:3]``
computed XLA-side in fp32 HIGHEST (same cancellation care as the lifted
train path). In-kernel matmuls are fp32.

Dense variant: scans all N candidates per query — the right shape for the
inner SA layers (N <= ~1024, where the voxel-grid prep doesn't pay) and for
MSG branches. SA1 at N=4096 uses the grid variant (fused_sa_eval_grid).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointnet12_tpu.kernels.ballquery_pallas import _inclusive_rank, _pick_tile


def _fused_dense_kernel(
    q_ref, p_ref, w_ref, t_ref, *refs, radius, nsample, tile_s, n_layers
):
    wb_refs = refs[: 2 * n_layers]
    out_ref = refs[2 * n_layers]
    hbuf = refs[2 * n_layers + 1]
    N = p_ref.shape[2]
    r2 = radius * radius
    C1p = w_ref.shape[2]  # C1 + 1 (ones column)
    C1 = C1p - 1

    p = p_ref[0]  # (3, N)
    x, y, z = p[0:1, :], p[1:2, :], p[2:3, :]
    qt = q_ref[0]  # (3, TS)
    qx = qt[0:1, :].reshape(tile_s, 1)
    qy = qt[1:2, :].reshape(tile_s, 1)
    qz = qt[2:3, :].reshape(tile_s, 1)
    d2 = (qx - x) ** 2 + (qy - y) ** 2 + (qz - z) ** 2  # (TS, N)
    mask = (d2 <= r2).astype(jnp.float32)
    rank = _inclusive_rank(mask, tile_s, N)  # (TS, N), monotone per row

    # hi/lo split: the MXU truncates f32 matmul inputs to bf16 (measured
    # on-chip: gathered values off by ~1e-2 relative), but the selection
    # matrix is exactly 0/1, so two bf16-input passes w = hi + lo recover
    # fp32-accurate gathers at 2x pass cost (vs 6x for HIGHEST).
    w = w_ref[0]  # (N, C1p)
    w_hi = w.astype(jnp.bfloat16).astype(jnp.float32)
    w_lo = w - w_hi
    t = t_ref[0]  # (TS, C1)

    def sel_body(k, g0):
        sel = jnp.where(rank == (k + 1).astype(jnp.float32), mask, 0.0)
        g = jnp.dot(
            sel, w_hi, preferred_element_type=jnp.float32
        ) + jnp.dot(sel, w_lo, preferred_element_type=jnp.float32)
        g0 = jnp.where(k == 0, g, g0)
        cnt = g[:, C1:]  # (TS, 1): 1 if a k-th neighbor exists else 0
        g = g + (1.0 - cnt) * g0  # reference pad-with-first
        hbuf[pl.ds(k * tile_s, tile_s), :] = jnp.maximum(
            g[:, :C1] - t, 0.0
        )  # ReLU(bn-folded h1)
        return g0

    lax.fori_loop(0, nsample, sel_body, jnp.zeros((tile_s, C1p), jnp.float32))

    acts = hbuf[:]  # (K*TS, C1)
    for i in range(n_layers):
        wk = wb_refs[2 * i][:]
        bk = wb_refs[2 * i + 1][:]
        # HIGHEST: chain FLOPs are trivial; true-fp32 passes keep the fused
        # output within ~1e-4 of the unfused path (default bf16 inputs
        # drift ~7e-3 through two layers, measured on-chip)
        acts = (
            jnp.dot(
                acts, wk, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            + bk
        )
        if i < n_layers - 1:
            acts = jnp.maximum(acts, 0.0)
    c_out = acts.shape[1]
    pooled = jnp.full((tile_s, c_out), -jnp.inf, jnp.float32)
    for k in range(nsample):  # static python slices — acts is a value
        pooled = jnp.maximum(
            pooled, acts[k * tile_s : (k + 1) * tile_s, :]
        )
    out_ref[0] = jnp.maximum(pooled, 0.0)  # post-pool ReLU


@functools.partial(
    jax.jit, static_argnames=("radius", "nsample", "interpret")
)
def fused_sa_eval_dense(
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    w: jnp.ndarray,
    t: jnp.ndarray,
    layers,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused eval SA layer. See module docstring.

    Args:
      xyz: (B, N, 3) points.  new_xyz: (B, S, 3) query centers.
      w: (B, N, C1) lifted+folded dense0 values per point.
      t: (B, S, C1) query-side correction (q @ W0f[:3]).
      layers: tuple of (kernel (Ci, Co), bias (Co,)) folded fp32 pairs.
    Returns: (B, S, C_out) pooled features (post-ReLU).
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    C1 = w.shape[-1]
    p = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))  # (B, 3, N)
    q = jnp.transpose(new_xyz.astype(jnp.float32), (0, 2, 1))  # (B, 3, S)
    wp = jnp.concatenate(
        [w.astype(jnp.float32), jnp.ones((B, N, 1), jnp.float32)], axis=-1
    )
    tile_s = _pick_tile(S)
    n_layers = len(layers)
    c_out = layers[-1][0].shape[1]

    wb_args, wb_specs = [], []
    for wk, bk in layers:
        wk = wk.astype(jnp.float32)
        bk = bk.astype(jnp.float32).reshape(1, -1)
        wb_args += [wk, bk]
        wb_specs += [
            pl.BlockSpec(wk.shape, lambda b, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bk.shape, lambda b, s: (0, 0), memory_space=pltpu.VMEM),
        ]

    return pl.pallas_call(
        functools.partial(
            _fused_dense_kernel,
            radius=float(radius),
            nsample=nsample,
            tile_s=tile_s,
            n_layers=n_layers,
        ),
        grid=(B, S // tile_s),
        out_shape=jax.ShapeDtypeStruct((B, S, c_out), jnp.float32),
        in_specs=[
            pl.BlockSpec(
                (1, 3, tile_s), lambda b, s: (b, 0, s), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 3, N), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, N, C1 + 1), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile_s, C1), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM
            ),
        ]
        + wb_specs,
        out_specs=pl.BlockSpec(
            (1, tile_s, c_out), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((nsample * tile_s, C1), jnp.float32),
        ],
        interpret=interpret,
    )(q, p, wp, t, *wb_args)


def fused_sa_eval_ref(radius, nsample, xyz, new_xyz, w, t, layers):
    """Exact jnp reference of the fused kernel (composition of the existing
    ops) — the parity oracle for tests and the selfcheck sanitizer."""
    from pointnet12_tpu.ops.ballquery import _ballquery_jnp
    from pointnet12_tpu.ops.gather import index_points

    idx = _ballquery_jnp(radius, nsample, xyz, new_xyz)  # (B, S, K)
    h = index_points(w, idx) - t[:, :, None, :]  # (B, S, K, C1)
    acts = jax.nn.relu(h)
    for i, (wk, bk) in enumerate(layers):
        acts = (
            jax.lax.dot_general(
                acts, wk, (((acts.ndim - 1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )
            + bk
        )
        if i < len(layers) - 1:
            acts = jax.nn.relu(acts)
    return jax.nn.relu(jnp.max(acts, axis=2))


# ---------------------------------------------------------------- grid variant

from pointnet12_tpu.kernels.ballquery_grid import (  # noqa: E402
    R_W,
    TB,
    TQ,
    WIN,
    _extract_first_k,
    grid_prep,
)


def _fused_grid_kernel(
    blocks_ref, ovf_ref, q_ref, p_ref, oidx_ref, w_ref, t_ref, *refs,
    radius, nsample, n_total, n_tiles, n_layers,
):
    """Grid-windowed fused eval SA (SA1 shapes): candidate scan + first-K
    extraction exactly as kernels/ballquery_grid.py, then a value-matching
    one-hot turns the group gather into per-tile MXU matmuls against the
    VMEM-resident window rows of w (count-normalized: a point appearing in
    two overlapping windows is matched twice and averaged back), then the
    folded MLP chain + K-max pool run on the VMEM-resident rows."""
    wb_refs = refs[: 2 * n_layers]
    out_ref = refs[2 * n_layers]
    idx_scr = refs[2 * n_layers + 1]  # (TB*TQ, K) i32
    hbuf = refs[2 * n_layers + 2]  # (K*TB*TQ, C1) f32
    b = pl.program_id(0)
    tb = pl.program_id(1)
    r2 = radius * radius
    K = nsample
    C1p = w_ref.shape[2]
    C1 = C1p - 1

    # ---- phase 1: candidates + extraction (ballquery_grid structure) ----
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
            for j in range(R_W):
                off = pl.multiple_of((blk + j) * WIN, WIN)
                pj = p_ref[0, :, pl.ds(off, WIN)]  # (3, WIN)
                xs.append(pj[0:1, :])
                ys.append(pj[1:2, :])
                zs.append(pj[2:3, :])
                oo.append(oidx_ref[0, 0:1, pl.ds(off, WIN)])
        cxs.append(jnp.concatenate(xs, axis=1))  # (1, cw)
        cys.append(jnp.concatenate(ys, axis=1))
        czs.append(jnp.concatenate(zs, axis=1))
        ois.append(jnp.concatenate(oo, axis=1))

    qx = jnp.concatenate(qxs, axis=0)  # (TB*TQ, 1)
    qy = jnp.concatenate(qys, axis=0)
    qz = jnp.concatenate(qzs, axis=0)
    cw = 3 * R_W * WIN
    cx = jnp.concatenate([jnp.broadcast_to(c, (TQ, cw)) for c in cxs], axis=0)
    cy = jnp.concatenate([jnp.broadcast_to(c, (TQ, cw)) for c in cys], axis=0)
    cz = jnp.concatenate([jnp.broadcast_to(c, (TQ, cw)) for c in czs], axis=0)
    oi = jnp.concatenate([jnp.broadcast_to(c, (TQ, cw)) for c in ois], axis=0)

    rows = TB * TQ
    d2 = (qx - cx) ** 2 + (qy - cy) ** 2 + (qz - cz) ** 2  # (rows, cw)
    score = jnp.where(d2 <= r2, oi, n_total)
    idx_scr[:] = _extract_first_k(score, K, n_total, rows)

    # per-tile degenerate-clustering rescan (see ballquery_grid v4)
    x_all = p_ref[0, 0:1, :]
    y_all = p_ref[0, 1:2, :]
    z_all = p_ref[0, 2:3, :]
    oi_all = oidx_ref[0, 0:1, :]

    def rescan(tt, _):
        @pl.when(ovf_ref[b * n_tiles + tb * TB + tt] != 0)
        def _():
            qt = q_ref[0, tt]
            qx = qt[0:1, :].reshape(TQ, 1)
            qy = qt[1:2, :].reshape(TQ, 1)
            qz = qt[2:3, :].reshape(TQ, 1)
            d2 = (qx - x_all) ** 2 + (qy - y_all) ** 2 + (qz - z_all) ** 2
            score = jnp.where(d2 <= r2, oi_all, n_total)
            idx_scr[pl.ds(tt * TQ, TQ), :] = _extract_first_k(
                score, K, n_total, TQ
            )
        return 0

    lax.fori_loop(0, TB, rescan, 0)

    # ---- phase 2: value-matching one-hot gather, per tile ----------------
    # k-major row r of the (K*TQ)-row workset maps to (k = r // TQ,
    # q = r % TQ). Mosaic cannot concatenate single-lane column slices
    # (tpu.concatenate offset mismatch — hit on-chip), so the flattened
    # index column o_km and the per-row t replica are built with STATIC
    # iota selection masks + MXU matmuls instead:
    #   rowsel[r, q] = [q == r % TQ]   ->  X_rep = rowsel @ X  (rows from X)
    #   o_km[r]      = sum_k out2[r, k] * [k == r // TQ]
    # Precision (measured on-chip): the MXU truncates f32 matmul inputs to
    # bf16 — index values up to N-1 round by ±16, silently breaking the
    # value match. The tiny o_km/t_rep reconstruct matmuls run HIGHEST
    # (true fp32); the big sel@w gathers use the hi/lo split (sel is
    # exactly 0/1, so two bf16 passes recover fp32 accuracy at 2x cost).
    hp = jax.lax.Precision.HIGHEST
    R = K * TQ
    ri = lax.broadcasted_iota(jnp.int32, (R, TQ), 0)
    ci = lax.broadcasted_iota(jnp.int32, (R, TQ), 1)
    rowsel = (ci == ri % TQ).astype(jnp.float32)  # (R, TQ) static
    rik = lax.broadcasted_iota(jnp.int32, (R, K), 0)
    cik = lax.broadcasted_iota(jnp.int32, (R, K), 1)
    colmask = (cik == rik // TQ).astype(jnp.float32)  # (R, K) static

    def _gather(sel, wc):
        wc_hi = wc.astype(jnp.bfloat16).astype(jnp.float32)
        return jnp.dot(
            sel, wc_hi, preferred_element_type=jnp.float32
        ) + jnp.dot(sel, wc - wc_hi, preferred_element_type=jnp.float32)

    for tt in range(TB):
        outv = idx_scr[tt * TQ : (tt + 1) * TQ, :]  # (TQ, K) value
        out2 = jax.lax.dot_general(
            rowsel, outv.astype(jnp.float32), (((1,), (0,)), ((), ())),
            precision=hp, preferred_element_type=jnp.float32,
        )  # (R, K): row r = outv[q(r), :]
        o_km = jnp.sum(out2 * colmask, axis=1, keepdims=True)  # (R, 1)
        t_t = t_ref[0, tt * TQ : (tt + 1) * TQ, :]  # (TQ, C1)
        t_rep = jax.lax.dot_general(
            rowsel, t_t, (((1,), (0,)), ((), ())),
            precision=hp, preferred_element_type=jnp.float32,
        )  # (R, C1): row r = t_t[q(r)]
        ovf_t = ovf_ref[b * n_tiles + tb * TB + tt]

        @pl.when(ovf_t == 0)
        def _(tt=tt, o_km=o_km, t_rep=t_rep):
            # window rows of w sliced on demand (keeping all TB tiles'
            # windows live across phases OOM'd VMEM at the flagship shape)
            base = (b * n_tiles + tb * TB + tt) * 3
            ww = []
            for rr in range(3):
                blk = blocks_ref[base + rr]
                for j in range(R_W):
                    off = pl.multiple_of((blk + j) * WIN, WIN)
                    ww.append(w_ref[0, pl.ds(off, WIN), :])
            wc = jnp.concatenate(ww, axis=0)  # (cw, C1p)
            sel = (o_km == ois[tt].astype(jnp.float32)).astype(jnp.float32)
            g = _gather(sel, wc)
            cnt = jnp.maximum(g[:, C1:], 1.0)
            h = jnp.maximum(g[:, :C1] / cnt - t_rep, 0.0)
            for k in range(K):
                hbuf[pl.ds(k * rows + tt * TQ, TQ), :] = (
                    h[k * TQ : (k + 1) * TQ, :]
                )

        @pl.when(ovf_t != 0)
        def _(tt=tt, o_km=o_km, t_rep=t_rep):
            sel = (o_km == oi_all.astype(jnp.float32)).astype(jnp.float32)
            g = _gather(sel, w_ref[0])
            cnt = jnp.maximum(g[:, C1:], 1.0)
            h = jnp.maximum(g[:, :C1] / cnt - t_rep, 0.0)
            for k in range(K):
                hbuf[pl.ds(k * rows + tt * TQ, TQ), :] = (
                    h[k * TQ : (k + 1) * TQ, :]
                )

    # ---- phase 3: folded MLP chain + K-max pool --------------------------
    acts = hbuf[:]  # (K*rows, C1)
    for i in range(n_layers):
        wk = wb_refs[2 * i][:]
        bk = wb_refs[2 * i + 1][:]
        acts = (
            jnp.dot(
                acts, wk, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            + bk
        )
        if i < n_layers - 1:
            acts = jnp.maximum(acts, 0.0)
    c_out = acts.shape[1]
    pooled = jnp.full((rows, c_out), -jnp.inf, jnp.float32)
    for k in range(K):
        pooled = jnp.maximum(pooled, acts[k * rows : (k + 1) * rows, :])
    out_ref[0] = jnp.maximum(pooled, 0.0)


@functools.partial(
    jax.jit, static_argnames=("radius", "nsample", "interpret")
)
def fused_sa_eval_grid(
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    w: jnp.ndarray,
    t: jnp.ndarray,
    layers,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Grid-windowed fused eval SA layer (SA1 shapes: N >= 2048, S divisible
    by 128). Same contract as :func:`fused_sa_eval_dense`."""
    from pointnet12_tpu.ops.gather import index_points

    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    C1 = w.shape[-1]
    assert S % (TQ * TB) == 0 and N % WIN == 0 and N >= R_W * WIN
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)
    g = grid_prep(radius, xyz, new_xyz, interpret=interpret)
    T = g["T"]
    wp = jnp.concatenate(
        [w.astype(jnp.float32), jnp.ones((B, N, 1), jnp.float32)], axis=-1
    )
    w_sorted = index_points(wp, g["perm"])  # (B, N, C1p) cell-sorted
    t_sorted = index_points(t.astype(jnp.float32), g["qperm"])  # (B, S, C1)

    n_layers = len(layers)
    c_out = layers[-1][0].shape[1]
    wb_args, wb_specs = [], []
    for wk, bk in layers:
        wk = wk.astype(jnp.float32)
        bk = bk.astype(jnp.float32).reshape(1, -1)
        wb_args += [wk, bk]
        wb_specs += [
            pl.BlockSpec(wk.shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bk.shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ]

    out_sorted = pl.pallas_call(
        functools.partial(
            _fused_grid_kernel,
            radius=float(radius),
            nsample=nsample,
            n_total=N,
            n_tiles=T,
            n_layers=n_layers,
        ),
        grid=(B, T // TB),
        out_shape=jax.ShapeDtypeStruct((B, S, c_out), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # blocks, flat
            pl.BlockSpec(memory_space=pltpu.SMEM),  # overflow, flat
            pl.BlockSpec(
                (1, TB, 3, TQ), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3, N), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, N), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, N, C1 + 1), lambda b, t: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, TB * TQ, C1), lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + wb_specs,
        out_specs=pl.BlockSpec(
            (1, TB * TQ, c_out), lambda b, t: (b, t, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((TB * TQ, nsample), jnp.int32),
            pltpu.VMEM((nsample * TB * TQ, C1), jnp.float32),
        ],
        interpret=interpret,
    )(
        g["blocks"].reshape(-1),
        g["ovf"].reshape(-1).astype(jnp.int32),
        g["sq_tiles"],
        g["spT"],
        g["oidx"],
        w_sorted,
        t_sorted,
        *wb_args,
    )
    # unsort to original query order
    _, inv = lax.sort(
        (g["qperm"], g["iota_s"]), dimension=1, is_stable=True, num_keys=1
    )
    return index_points(out_sorted, inv)
