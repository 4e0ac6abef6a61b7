"""Pallas TPU kernel for the batched weighted segment-matmul (ops/segsum.py).

Grid ``(B, M // TM, R // RBLK)``; each step owns a TM-row output tile and
an RBLK-wide slab of the R rows. It walks its slab in RC-wide chunks,
builds the one-hot (weighted) selection tile
``A[m, r] = sum_j w[j, r] * [idx[j, r] == m0 + m]`` with J compare+select
passes on the VPU, and accumulates ``A @ values_chunk`` on the MXU. The
selection matrix never exists outside VMEM; the output tile is revisited
across consecutive r-steps (r is the innermost grid dim) and accumulated
in place.

VMEM plan (``_plan``): RBLK = R (one slab, values fetched once per batch
element — the common case at the flagship shapes) unless the
double-buffered blocks would exceed the 16 MB scoped-VMEM limit, which
the MSG K=128 backward hits (values (16384, 128) f32 = 8 MB/block; the
whole-R form OOMed by 128 KB on-chip). Then R is halved until it fits and
TM grown to reduce (ideally eliminate: M // TM == 1) the per-M-tile
values refetch the split introduces.

idx/weights come in TRANSPOSED ``(B, J, R)`` layout so per-chunk reads are
lane-contiguous ``(1, RC)`` slices needing no in-kernel relayout.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the 16 MB scoped cap


def _pick_chunk(r: int) -> int:
    for c in (512, 384, 256, 128, 64, 32, 16, 8):
        if r % c == 0:
            return c
    return r


def _vmem_bytes(tm, rblk, C, J, has_w):
    rc = _pick_chunk(rblk)
    n_idx = 2 if has_w else 1
    return (
        2 * rblk * C * 4  # values block, double-buffered
        + 2 * J * rblk * 4 * n_idx  # idx (+ weights) blocks
        + 2 * tm * C * 4  # output tile
        + 2 * tm * rc * 4  # selection tile + iota scratch
    )


def _plan(M, R, C, J, has_w):
    """Choose (tm, rblk) so double-buffered blocks fit scoped VMEM."""
    tm = min(128, M)
    rblk = R
    while _vmem_bytes(tm, rblk, C, J, has_w) > _VMEM_BUDGET and rblk % 2 == 0:
        rblk //= 2
    if rblk < R:
        # R was split, so values re-fetch once per M-tile; grow the M-tile
        # (same total compare+matmul work) to cut the refetch factor.
        for cand in (256, 512):
            if M % cand == 0 and cand <= M and (
                _vmem_bytes(cand, rblk, C, J, has_w) <= _VMEM_BUDGET
            ):
                tm = cand
    return tm, rblk


def _segmm_kernel(idx_ref, w_ref, val_ref, out_ref, *, tm, rc, has_w):
    J = idx_ref.shape[1]
    RBLK = idx_ref.shape[2]
    r_step = pl.program_id(2)
    m0 = pl.program_id(1) * tm
    iota_m = lax.broadcasted_iota(jnp.int32, (tm, rc), 0) + m0

    def chunk(i, acc):
        r0 = i * rc
        a = jnp.zeros((tm, rc), jnp.float32)
        for j in range(J):
            ij = idx_ref[0, j : j + 1, pl.ds(r0, rc)]  # (1, rc)
            hit = ij == iota_m  # (tm, rc)
            if has_w:
                wj = w_ref[0, j : j + 1, pl.ds(r0, rc)]  # (1, rc)
                a = a + jnp.where(hit, wj, 0.0)
            else:
                a = a + hit.astype(jnp.float32)
        v = val_ref[0, pl.ds(r0, rc), :]  # (rc, C)
        return acc + lax.dot_general(
            a, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = lax.fori_loop(
        0, RBLK // rc, chunk, jnp.zeros((tm, out_ref.shape[2]), jnp.float32)
    )

    @pl.when(r_step == 0)
    def _init():
        out_ref[0] = acc

    @pl.when(r_step != 0)
    def _accumulate():
        out_ref[0] += acc


@functools.partial(
    jax.jit, static_argnames=("num_segments", "interpret")
)
def segment_matmul_pallas(
    idx: jnp.ndarray,
    weights,
    values: jnp.ndarray,
    num_segments: int,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """See ops/segsum.py::segment_matmul. idx/weights ``(B, J, R)``,
    values ``(B, R, C)`` -> ``(B, num_segments, C)`` f32."""
    B, J, R = idx.shape
    C = values.shape[-1]
    M = num_segments
    has_w = weights is not None
    tm, rblk = _plan(M, R, C, J, has_w)
    assert M % tm == 0, (M, tm)
    assert R % rblk == 0, (R, rblk)
    rc = _pick_chunk(rblk)

    idx = idx.astype(jnp.int32)
    values = values.astype(jnp.float32)
    ins = [idx]
    in_specs = [
        pl.BlockSpec(
            (1, J, rblk), lambda b, m, r: (b, 0, r), memory_space=pltpu.VMEM
        )
    ]
    if has_w:
        ins.append(weights.astype(jnp.float32))
        in_specs.append(
            pl.BlockSpec(
                (1, J, rblk), lambda b, m, r: (b, 0, r),
                memory_space=pltpu.VMEM,
            )
        )
    else:
        # keep the kernel arity static: pass a (B, 1, 1) zero placeholder
        ins.append(jnp.zeros((B, 1, 1), jnp.float32))
        in_specs.append(
            pl.BlockSpec(
                (1, 1, 1), lambda b, m, r: (b, 0, 0), memory_space=pltpu.VMEM
            )
        )
    ins.append(values)
    in_specs.append(
        pl.BlockSpec(
            (1, rblk, C), lambda b, m, r: (b, r, 0), memory_space=pltpu.VMEM
        )
    )

    return pl.pallas_call(
        functools.partial(_segmm_kernel, tm=tm, rc=rc, has_w=has_w),
        grid=(B, M // tm, R // rblk),
        out_shape=jax.ShapeDtypeStruct((B, M, C), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tm, C), lambda b, m, r: (b, m, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(*ins)
