"""Pallas TPU kernel for farthest-point sampling.

Reference cost model (SURVEY.md §3.2): the reference runs a Python loop of
``npoint`` sequential CUDA launches per SA layer — its dominant inefficiency.
Here the whole iteration is ONE kernel: the per-cloud coordinates and the
running-min ``distance`` array stay resident in VMEM across all ``npoint``
iterations, and each iteration is {one-hot centroid reduce, distance update,
running min, masked argmax} on the VPU.

Layout: 16 clouds are packed per grid block so every (8, 128) VPU tile is
fully occupied (a single cloud would waste 7/8 sublanes) AND the flagship
batch runs as ONE grid step. TPU grid steps execute sequentially, and the
FPS loop is latency-bound (argmax -> one-hot reduce -> distance-update
dependency chain), so halving the step count at B=16 nearly halves wall
time; the wider (16, N) rows ride the same VPU issue slots. Coordinates
are fed as three ``(B, N)`` planes (split outside the kernel — XLA fuses
the transpose into the producing op).

Tie-breaking: argmax resolves to the FIRST maximal index (masked min over an
index iota), matching ``jnp.argmax`` and the torch-CPU oracle.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 16  # clouds per grid block (2 sublane tiles; see module docstring)


def _fps_kernel(x_ref, y_ref, z_ref, start_ref, out_ref, *, npoint: int):
    RB, N = x_ref.shape
    x, y, z = x_ref[:], y_ref[:], z_ref[:]
    iota_n = lax.broadcasted_iota(jnp.int32, (RB, N), 1)
    iota_np = lax.broadcasted_iota(jnp.int32, (RB, npoint), 1)

    def body(i, carry):
        dist, farthest, out = carry
        out = jnp.where(iota_np == i, farthest, out)
        sel = iota_n == farthest  # (RB, N) one-hot per row
        cx = jnp.sum(jnp.where(sel, x, 0.0), axis=1, keepdims=True)
        cy = jnp.sum(jnp.where(sel, y, 0.0), axis=1, keepdims=True)
        cz = jnp.sum(jnp.where(sel, z, 0.0), axis=1, keepdims=True)
        d = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        dist = jnp.minimum(dist, d)
        m = jnp.max(dist, axis=1, keepdims=True)
        farthest = jnp.min(
            jnp.where(dist == m, iota_n, N), axis=1, keepdims=True
        )
        return dist, farthest, out

    init = (
        jnp.full((RB, N), 1e10, jnp.float32),
        start_ref[:],
        jnp.zeros((RB, npoint), jnp.int32),
    )
    _, _, out = lax.fori_loop(0, npoint, body, init)
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def fps_pallas(
    xyz: jnp.ndarray,
    npoint: int,
    start: jnp.ndarray,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """FPS indices. xyz: (B, N, 3); start: (B,) int32 -> (B, npoint) int32."""
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)
    planes = [xyz[:, :, i] for i in range(3)]  # 3 x (B, N)
    start2d = start.astype(jnp.int32)[:, None]  # (B, 1)

    grid = (pl.cdiv(B, _ROWS),)
    plane_spec = pl.BlockSpec(
        (_ROWS, N), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_fps_kernel, npoint=npoint),
        out_shape=jax.ShapeDtypeStruct((B, npoint), jnp.int32),
        grid=grid,
        in_specs=[
            plane_spec,
            plane_spec,
            plane_spec,
            pl.BlockSpec((_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_ROWS, npoint), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(*planes, start2d)
