"""Pallas TPU kernel for the batched weighted segment-matmul (ops/segsum.py).

Grid ``(B, M // TM)``; each step owns a TM-row output tile. It walks the R
rows in RC-wide chunks, builds the one-hot (weighted) selection tile
``A[m, r] = sum_j w[j, r] * [idx[j, r] == m0 + m]`` with J compare+select
passes on the VPU, and accumulates ``A @ values_chunk`` on the MXU. The
selection matrix never exists outside VMEM, so HBM traffic is exactly one
read of (idx, weights, values) per M-tile plus one output write — vs XLA's
scatter-add which serializes one row per ~10 ns.

idx/weights come in TRANSPOSED ``(B, J, R)`` layout so per-chunk reads are
lane-contiguous ``(1, RC)`` slices needing no in-kernel relayout.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_chunk(r: int) -> int:
    for c in (512, 384, 256, 128, 64, 32, 16, 8):
        if r % c == 0:
            return c
    return r


def _segmm_kernel(idx_ref, w_ref, val_ref, out_ref, *, tm, rc, has_w):
    J = idx_ref.shape[1]
    R = idx_ref.shape[2]
    C = val_ref.shape[2]
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

    out_ref[0] = lax.fori_loop(
        0, R // rc, chunk, jnp.zeros((tm, C), jnp.float32)
    )


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
    tm = min(128, M)
    assert M % tm == 0, (M, tm)
    rc = _pick_chunk(R)
    has_w = weights is not None

    idx = idx.astype(jnp.int32)
    values = values.astype(jnp.float32)
    ins = [idx]
    in_specs = [
        pl.BlockSpec((1, J, R), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM)
    ]
    if has_w:
        ins.append(weights.astype(jnp.float32))
        in_specs.append(
            pl.BlockSpec(
                (1, J, R), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM
            )
        )
    else:
        # keep the kernel arity static: pass a (B, 1, 1) zero placeholder
        ins.append(jnp.zeros((B, 1, 1), jnp.float32))
        in_specs.append(
            pl.BlockSpec(
                (1, 1, 1), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM
            )
        )
    ins.append(values)
    in_specs.append(
        pl.BlockSpec((1, R, C), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM)
    )

    return pl.pallas_call(
        functools.partial(_segmm_kernel, tm=tm, rc=rc, has_w=has_w),
        grid=(B, M // tm),
        out_shape=jax.ShapeDtypeStruct((B, M, C), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tm, C), lambda b, m: (b, m, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(*ins)
