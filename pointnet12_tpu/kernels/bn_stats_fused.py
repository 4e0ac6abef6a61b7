"""Pallas TPU kernel: Dense matmul with a BN-statistics epilogue.

Round-4 measured the train step's BN batch-stat pass as an HBM wall
(docs/PERFORMANCE.md "BN batch-stat rewrite"): the forward stat reduce
re-READS every just-written activation (~0.46 ms/step at the flagship
shape, at 1.1x the bandwidth floor), and no contraction rewrite can beat
a pass that is already bandwidth-bound. The only way to win is to never
re-read: this kernel accumulates the per-channel sum and sum-of-squares
in VMEM scratch WHILE the matmul's output tiles stream through, so the
separate stat pass disappears (VERDICT r5 item 5 — distinct from the
measured-slower moment-folding in nn/mlp.py::_folded_dense_stats, which
added moment matmuls to forward AND backward).

Semantics (matching the unfused train path exactly, fp association
aside): ``y = cast(x @ w) + cast(b)`` with f32 MXU accumulation rounded
to ``out_dtype`` (what ``nn.Dense(dtype=...)`` compiles to), and
``mean/var`` the biased batch moments of ``f32(y)`` over all leading
axes (what ``nn.BatchNorm``/``MomentBN`` consume). The caller applies
the BN affine + ReLU + downcast as today — those stay one fused XLA
elementwise pass.

Backward is standard XLA (``_bwd`` below): the mean/var cotangents fold
into the matmul cotangent as ``g = gy + gmean/R + 2*gvar*(y - mean)/R``,
then ``gx = g @ w^T``, ``gw = x^T @ g`` — no extra passes vs the
unfused backward (which also re-reads y-sized tensors for its reduces).

Grouped (B, S, K, C) inputs are blocked as (1, Sblk, K, C) and reshaped
to rows IN-KERNEL (a major-dim collapse; the equivalent XLA-level
reshape forces the {1,3,2,0} relayout copies measured at ~7 ms/step,
nn/mlp.py::_folded_dense_stats notes).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointnet12_tpu.kernels.dispatch import pallas_enabled

_TARGET_ROWS = 2048  # rows per grid step (~1-4 MB blocks incl. output)


def _cast_out(acc, bias, bf16_out):
    """f32 matmul accumulator + bias -> output, matching nn.Dense: the
    accumulator rounds to the output dtype FIRST, then the (already
    cast) bias adds at that dtype."""
    if bf16_out:
        return acc.astype(jnp.bfloat16) + bias.astype(jnp.bfloat16)
    return acc + bias


def _kernel(x_ref, w_ref, b_ref, y_ref, s_ref, ss_ref, s_acc, ss_acc,
            *, bf16_out, rows, ci):
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(step == 0)
    def _init():
        s_acc[...] = jnp.zeros_like(s_acc)
        ss_acc[...] = jnp.zeros_like(ss_acc)

    xb = x_ref[...].reshape(rows, ci)
    acc = jnp.dot(xb, w_ref[...], preferred_element_type=jnp.float32)
    y = _cast_out(acc, b_ref[...], bf16_out)
    y_ref[...] = y.reshape(y_ref.shape)
    # stats MUST see the ROUNDED values. Neither a plain astype back to
    # f32 nor a store/load round-trip survives compilation: the excess-
    # precision pass folds the f32->bf16->f32 convert chain feeding the
    # sums and the stats come out over UNROUNDED values (measured 0.35
    # off on a 256-row sum). lax.optimization_barrier has no Pallas TPU
    # lowering (fatal on-chip, measured round 5). Bit-exact and fold-proof
    # instead: f32(bf16 v) IS v's bits in the high 16 — reconstruct
    # through integer bitcasts, which no pass can elide.
    if bf16_out:
        bits = lax.bitcast_convert_type(y, jnp.uint16).astype(jnp.uint32)
        yf = lax.bitcast_convert_type(bits << 16, jnp.float32)
    else:
        yf = y
    s_acc[...] += jnp.sum(yf, axis=0, keepdims=True)
    ss_acc[...] += jnp.sum(yf * yf, axis=0, keepdims=True)

    @pl.when(step == nsteps - 1)
    def _emit():
        s_ref[...] = s_acc[...]
        ss_ref[...] = ss_acc[...]


def _block_plan(shape):
    """(block_shape, index_map, rows_per_step, n_steps) for a leading-axes
    row blocking of ``shape`` = (..., Ci). Returns None if the shape has
    no clean blocking (caller falls back to the jnp path)."""
    lead, ci = shape[:-1], shape[-1]
    if not lead:
        return None
    if len(lead) == 1:
        (r,) = lead
        blk = r
        while blk > _TARGET_ROWS and blk % 2 == 0:
            blk //= 2
        if r % blk:
            return None
        n = r // blk
        return (blk, ci), (lambda i: (i, 0)), blk, n
    if len(lead) == 2:  # (B, N, Ci)
        b, nn_ = lead
        blk = nn_
        while blk > _TARGET_ROWS and blk % 2 == 0:
            blk //= 2
        if nn_ % blk:
            return None
        n = nn_ // blk
        return (
            (1, blk, ci),
            (lambda i: (i // n, i % n, 0)),
            blk,
            b * n,
        )
    if len(lead) == 3:  # (B, S, K, Ci) grouped
        b, s, k = lead
        sblk = s
        while sblk * k > _TARGET_ROWS and sblk % 2 == 0:
            sblk //= 2
        if s % sblk:
            return None
        n = s // sblk
        return (
            (1, sblk, k, ci),
            (lambda i: (i // n, i % n, 0, 0)),
            sblk * k,
            b * n,
        )
    return None


def _pallas_fwd(bf16_out, x, w, b, interpret):
    plan = _block_plan(x.shape)
    assert plan is not None
    block, idx_map, rows, nsteps = plan
    ci, co = w.shape
    out_dtype = jnp.bfloat16 if bf16_out else jnp.float32
    y, s, ss = pl.pallas_call(
        functools.partial(_kernel, bf16_out=bf16_out, rows=rows, ci=ci),
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(block, idx_map),
            pl.BlockSpec((ci, co), lambda i: (0, 0)),
            pl.BlockSpec((1, co), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(block[:-1] + (co,), idx_map),
            pl.BlockSpec((1, co), lambda i: (0, 0)),
            pl.BlockSpec((1, co), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape[:-1] + (co,), out_dtype),
            jax.ShapeDtypeStruct((1, co), jnp.float32),
            jax.ShapeDtypeStruct((1, co), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, co), jnp.float32),
            pltpu.VMEM((1, co), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x, w, b[None, :])
    return y, s[0], ss[0]


def _ref_fwd(bf16_out, x, w, b):
    """Exact jnp reference: same rounding sequence, XLA reduces."""
    acc = jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = _cast_out(acc, b, bf16_out)
    yf = y.astype(jnp.float32)
    axes = tuple(range(y.ndim - 1))
    return y, jnp.sum(yf, axis=axes), jnp.sum(yf * yf, axis=axes)


def _rows_of(x):
    r = 1
    for d in x.shape[:-1]:
        r *= d
    return r


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _dense_bn_stats(bf16_out, use_pallas, x, w, b):
    y, mean, var = _dense_bn_stats_fwd(bf16_out, use_pallas, x, w, b)[0]
    return y, mean, var


def _dense_bn_stats_fwd(bf16_out, use_pallas, x, w, b):
    # x/w arrive pre-cast to the compute dtype (public wrapper) so the
    # bwd cotangent dtypes match the primal inputs
    xc, wc, bc = x, w, b.astype(jnp.float32)
    if use_pallas:
        interpret = jax.default_backend() != "tpu"
        y, s, ss = _pallas_fwd(bf16_out, xc, wc, bc, interpret)
        from pointnet12_tpu.kernels import selfcheck

        if selfcheck.collecting():
            yr, sr_, ssr = _ref_fwd(bf16_out, xc, wc, bc)
            selfcheck.assert_close("bn_stats_fused:y", y, yr, atol=2e-2)
            r = _rows_of(x)
            selfcheck.assert_close(
                "bn_stats_fused:mean", s / r, sr_ / r, atol=1e-3
            )
    else:
        y, s, ss = _ref_fwd(bf16_out, xc, wc, bc)
    r = _rows_of(x)
    mean = s / r
    var = jnp.maximum(ss / r - mean * mean, 0.0)
    return (y, mean, var), (xc, wc, y, mean)


def _dense_bn_stats_bwd(bf16_out, use_pallas, res, cts):
    xc, wc, y, mean = res
    gy, gmean, gvar = cts
    r = float(_rows_of(y))
    yf = y.astype(jnp.float32)
    # mean/var cotangents fold into the per-element cotangent:
    #   d mean_c / d y_rc = 1/R
    #   d var_c  / d y_rc = 2 (y_rc - mean_c) / R
    g = (
        gy.astype(jnp.float32)
        + gmean / r
        + (2.0 / r) * gvar * (yf - mean)
    )
    cdt = xc.dtype
    gc = g.astype(cdt)
    gx = jax.lax.dot_general(
        gc, wc, (((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(xc.dtype)
    axes = tuple(range(g.ndim - 1))
    gw = jax.lax.dot_general(
        xc, gc, ((axes, axes), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gb = jnp.sum(g, axis=axes)
    return gx, gw, gb


_dense_bn_stats.defvjp(
    lambda bf16_out, use_pallas, x, w, b: _dense_bn_stats_fwd(
        bf16_out, use_pallas, x, w, b
    ),
    _dense_bn_stats_bwd,
)


def dense_bn_stats(x, kernel, bias, out_dtype=jnp.float32, impl="auto"):
    """``y = cast(x @ kernel) + bias`` plus the biased batch moments of
    ``f32(y)`` over all leading axes, in one pass over the output.

    Returns ``(y, mean, var)`` with ``y`` in ``out_dtype`` and the
    moments in f32 — exactly what the train-mode Dense+BatchNorm pair
    computes today, minus the activation re-read for the stats.

    impl: "auto" (Pallas on TPU, jnp elsewhere), "pallas", "jnp".
    Shapes without a clean power-of-two row blocking fall back to jnp.
    """
    bf16_out = out_dtype == jnp.bfloat16
    use_pallas = (
        impl == "pallas" or (impl == "auto" and pallas_enabled())
    ) and _block_plan(x.shape) is not None
    cdt = jnp.bfloat16 if bf16_out else jnp.float32
    # cast OUTSIDE the custom_vjp (the casts carry their own upcasting
    # VJPs, and the inner bwd can then return cotangents in the compute
    # dtype, matching its primal inputs)
    return _dense_bn_stats(
        bf16_out, use_pallas, x.astype(cdt), kernel.astype(cdt), bias
    )
