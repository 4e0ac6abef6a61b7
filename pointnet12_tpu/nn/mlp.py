"""Shared per-point MLP: Dense + BatchNorm + ReLU over the feature axis.

Reference behavior: stacks of 1x1 ``nn.Conv2d``/``nn.Conv1d`` + ``BatchNorm``
+ ReLU applied pointwise over ``(B, C, K, S)`` / ``(B, C, N)`` (SURVEY.md §2,
PointNetSetAbstraction & friends). A 1x1 conv over points IS a matmul over
the channel axis, so the TPU-native form is ``nn.Dense`` on channels-last
tensors — one MXU matmul per layer with BN+ReLU fused by XLA.

BatchNorm parity notes (SURVEY.md §7 "hard parts"):
  * torch ``momentum=0.1`` updates ``running = 0.9*running + 0.1*batch``;
    flax's ``momentum`` is the complement, so we pass ``momentum=0.9``.
  * torch normalizes with biased batch variance (like flax) but updates the
    running variance with the *unbiased* estimate; flax uses biased for both.
    Eval-parity tests import torch running stats directly, so this only
    perturbs training statistics at O(1/batch) — accepted drift.
  * torch keeps conv bias even under BN (redundant); we mirror it so the
    parameter trees map 1:1 for weight import.
"""

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

BN_MOMENTUM = 0.9  # == torch momentum 0.1 (complement convention)
BN_EPS = 1e-5

# EXPERIMENT knob (bench/bn_epilogue_ab.py, VERDICT r5 item 5): compute the
# train-mode Dense outputs AND their BN batch moments in ONE Pallas pass
# (kernels/bn_stats_fused.py), deleting the separate stat-read over the
# just-written activation (measured at the HBM wall, ~0.46 ms/step fwd).
# Default off until the on-chip A/B and a quality probe say otherwise;
# toggle via set_fused_bn_stats() or POINTNET12_TPU_FUSED_BN=1.
import os as _os

_FUSED_BN_STATS = {"value": _os.environ.get("POINTNET12_TPU_FUSED_BN") == "1"}


def set_fused_bn_stats(enabled: bool) -> None:
    _FUSED_BN_STATS["value"] = bool(enabled)


def fused_bn_stats_enabled() -> bool:
    return _FUSED_BN_STATS["value"]


# EXPERIMENT knob (bench/eval_flat_ab.py) — MEASURED DEAD END, keep False.
# Hypothesis was: run the EVAL-mode grouped MLP chain on a flat (B, S*K, C)
# view to skip the ~0.5 ms/step of {1,3,2,0} relayout copies on the
# gathered grouped tensors (with BN folded there is no stat-reduce to want
# the grouped layout). On-chip A/B (round 4): flat 7.83 ms vs base 5.99 ms
# eval forward — SLOWER, same direction as the train-mode flat experiment
# (+8.5 ms; NOTE below). XLA re-inserts the relayout at the K-max reshape
# boundary and loses the matmul fusions on the way. Exact (logit delta 0).
EVAL_FLAT_MLP = False


@jax.custom_vjp
def _sr_to_bf16(x: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Stochastically round fp32 to bfloat16: P(round up) = mantissa frac.

    Adds 16 uniform random bits below the bf16 mantissa boundary, then
    truncates — the standard SR-by-carry construction. Values already
    bf16-representable (zero low bits) are returned EXACTLY (bits < 2^16
    can't carry). Random bits come from a per-element xxhash-style integer
    finalizer over a flat iota + per-call seed: ~6 fused VPU int ops per
    element, so XLA fuses the whole cast into the producer — no extra HBM
    pass and no threefry tensor (measured requirement: the grouped casts
    sit on the SA HBM bottleneck this knob exists to relieve). Not crypto;
    unbiasedness is all SR needs. Inf/NaN inputs are not handled (grouped
    activations are finite; --debug_nans guards the rest).
    """
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    ctr = jnp.arange(x.size, dtype=jnp.uint32).reshape(x.shape)
    h = ctr * jnp.uint32(2654435761) + seed
    h = h ^ (h >> 15)
    h = h * jnp.uint32(2246822519)
    h = h ^ (h >> 13)
    u = (u + (h & jnp.uint32(0xFFFF))) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(u, jnp.float32).astype(jnp.bfloat16)


def _sr_to_bf16_fwd(x, seed):
    return _sr_to_bf16(x, seed), seed.shape


def _sr_to_bf16_bwd(seed_shape, g):
    # straight-through, same as astype(bf16)'s own VJP: upcast the incoming
    # bf16 cotangent. The integer seed takes a float0 zero cotangent.
    import numpy as _np

    return (
        g.astype(jnp.float32),
        _np.zeros(seed_shape, jax.dtypes.float0),
    )


_sr_to_bf16.defvjp(_sr_to_bf16_fwd, _sr_to_bf16_bwd)


def _activation_cast(mod: nn.Module, x, dtype, sr: bool, train: bool):
    """fp32 -> ``dtype`` activation cast, stochastically rounded in train
    when ``sr`` (each call draws a fresh seed off the dropout rng stream —
    flax folds a per-call counter, so distinct casts get distinct bits).
    Eval always uses deterministic round-to-nearest (stable serving)."""
    if dtype == jnp.float32 or not (sr and train):
        return x.astype(dtype)
    seed = jax.random.bits(mod.make_rng("dropout"), (), jnp.uint32)
    return _sr_to_bf16(x, seed)


class MomentBN(nn.Module):
    """BatchNorm parameter/statistics holder for the folded Dense+BN path.

    Declares the SAME variable tree as ``nn.BatchNorm`` (params
    ``scale``/``bias``, batch_stats ``mean``/``var``) so checkpoints and
    torch imports are byte-compatible, but instead of normalizing a tensor
    it returns the per-channel affine ``(eff_scale, eff_bias)`` with
    ``bn(h) == h * eff_scale + eff_bias``. The caller folds ``eff_scale``
    into the preceding matmul's columns, so normalize never touches the
    ``(B, S, K, C)`` activations (the SA layers' HBM bottleneck).

    In train mode the caller supplies batch ``(mean, var)`` — computed
    moment-wise, see ``_folded_dense_stats`` — and the running statistics
    are EMA-updated exactly as flax does; in eval mode the running
    statistics are used and the inputs are ignored.
    """

    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS

    @nn.compact
    def __call__(self, batch_mean, batch_var, train: bool):
        width = batch_mean.shape[-1]
        scale = self.param(
            "scale", nn.initializers.ones, (width,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (width,), jnp.float32
        )
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((width,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((width,), jnp.float32)
        )
        if train:
            mean, var = batch_mean, batch_var
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * batch_mean
                ra_var.value = m * ra_var.value + (1.0 - m) * batch_var
        else:
            mean, var = ra_mean.value, ra_var.value
        eff_scale = scale * jax.lax.rsqrt(var + self.epsilon)
        return eff_scale, bias - mean * eff_scale


def _folded_dense_stats(x, kernel, bias):
    """Batch mean/var of ``h = x @ kernel + bias`` WITHOUT materializing h.

    BN statistics are quadratic in h, and h is linear in x, so they follow
    from x's first/second moments:

        mean_c = (s . w_c)/R + b_c            s = sum_r x_r
        E[h_c^2] = w_c^T M w_c / R + 2 b_c (s . w_c)/R + b_c^2
                                              M = x^T x  (one MXU matmul)
        var_c  = E[h_c^2] - mean_c^2          (biased, as flax uses)

    This replaces the stat-reduce pass over the (B*S*K, C_out) activation
    tensor with one (R, C_in) x (R, C_in) moment matmul plus an O(C^2)
    epilogue — the caller then folds the normalize into the main matmul's
    columns, so per layer the big tensor is READ twice and written once
    (vs write-h / stats-read / normalize-read under unfolded BN). Exact up
    to fp reassociation; runs fp32 HIGHEST so the E[h^2]-mean^2
    cancellation keeps ~7 clean digits.
    """
    hp = jax.lax.Precision.HIGHEST
    x2 = x.astype(jnp.float32)
    # contract the row axes IN PLACE with a multi-axis dot_general: an
    # explicit reshape(-1, C) view made XLA relayout the grouped 4-D
    # tensor around the dots ({1,3,2,0} <-> {2,1,0,3} copies + reshapes,
    # ~7 ms/step at the flagship shape, profiled) in forward AND backward.
    axes = tuple(range(x.ndim - 1))
    r = 1.0
    for a in axes:
        r *= x.shape[a]
    s = jnp.sum(x2, axis=axes)  # (Ci,)
    m2 = jax.lax.dot_general(
        x2, x2, ((axes, axes), ((), ())), precision=hp
    )  # (Ci, Ci)
    sw = jax.lax.dot_general(
        s[None], kernel, (((1,), (0,)), ((), ())), precision=hp
    )[0]
    mean = sw / r + bias
    p = jax.lax.dot_general(
        m2, kernel, (((1,), (0,)), ((), ())), precision=hp
    )
    e_h2 = (
        jnp.einsum("ic,ic->c", kernel, p, precision=hp) / r
        + 2.0 * bias * sw / r
        + bias * bias
    )
    var = jnp.maximum(e_h2 - mean * mean, 0.0)
    return mean, var


def _folded_dense_bn(x, dense, bn, train, dtype):
    """relu-less Dense+BN with the normalize folded into the matmul.

    ``dense`` and ``bn`` are bound submodules (``nn.Dense`` /``MomentBN``);
    the Dense params are created here via a dummy call so the variable
    tree matches the unfolded path exactly.

    Measured on-chip (flagship step): folding in TRAIN mode loses ~2 ms —
    the moment matmuls plus their backward cost more than the stat-reduce /
    normalize passes XLA already fuses well — so the modules below fold
    only in eval mode, where running stats make the fold free and serving
    throughput jumps 1340 -> ~2100 clouds/sec (B=16, N=4096). The train
    path (``train=True``) is kept correct and tested for experimentation.
    """
    dense(jnp.zeros((1, x.shape[-1]), jnp.float32))  # create params
    kernel = dense.variables["params"]["kernel"].astype(jnp.float32)
    bias = dense.variables["params"]["bias"].astype(jnp.float32)
    if train:
        mean, var = _folded_dense_stats(x, kernel, bias)
    else:
        width = kernel.shape[1]
        mean = var = jnp.zeros((width,), jnp.float32)  # unused in eval
    eff_scale, eff_bias = bn(mean, var, train)
    w = (kernel * eff_scale[None, :]).astype(dtype)
    # bn(h) = h*eff_scale + eff_bias with h = x@kernel + bias, so the Dense
    # bias rides the affine too: + bias*eff_scale.
    b = bias * eff_scale + eff_bias
    return (
        jax.lax.dot_general(
            x.astype(dtype), w, (((x.ndim - 1,), (0,)), ((), ()))
        )
        + b.astype(dtype)
    )


def _fused_dense_bn(x, dense, bn, dtype):
    """Train-mode Dense + batch-stat BN with the statistics accumulated in
    the matmul's epilogue (kernels/bn_stats_fused.py) instead of a
    separate read pass over the activation. ``dense``/``bn`` are bound
    submodules (``nn.Dense`` / ``MomentBN``); params are created via a
    dummy call so the variable tree matches the unfolded path exactly.
    Returns the f32 normalized tensor — the caller applies ReLU and the
    activation downcast, exactly as after ``nn.BatchNorm``."""
    from pointnet12_tpu.kernels.bn_stats_fused import dense_bn_stats

    dense(jnp.zeros((1, x.shape[-1]), jnp.float32))  # create params
    kernel = dense.variables["params"]["kernel"]
    bias = dense.variables["params"]["bias"]
    y, mean, var = dense_bn_stats(x, kernel, bias, out_dtype=dtype)
    eff_scale, eff_bias = bn(mean, var, True)
    return y.astype(jnp.float32) * eff_scale + eff_bias


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _lifted_group_dense(n_points, pts, q, idx, kernel, bias):
    """h1_pre[b,s,k] = (pts@kernel + bias)[idx[b,s,k]] - (q@kernel[:3])[b,s].

    Equals dense(concat(p[idx]-q, f[idx])) exactly (fp reassociation aside).
    The custom VJP exists because the naive gradient materializes
    dL/dw = scatter_add(g, idx) — a B*S*K-row scatter XLA executes
    row-serialized (~6.9 ms/step at the flagship shape, profiled). Instead
    dkernel is computed scatter-free from the gathered inputs
    (dkernel = gather(pts, idx)^T @ g); the scatter-shaped dpts runs through
    the one-hot MXU segment-matmul (ops/segsum.py) and is dead code whenever
    the layer's input features carry no gradient (SA1: raw points).
    """
    w = jax.lax.dot_general(
        pts, kernel, (((2,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    ) + bias
    t = jax.lax.dot_general(
        q, kernel[:3], (((2,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    from pointnet12_tpu.ops.gather import index_points

    return index_points(w, idx) - t[:, :, None, :]


def _lifted_group_dense_fwd(n_points, pts, q, idx, kernel, bias):
    """Forward for training: ONE merged gather of concat([w, pts], -1).

    v5e gathers are descriptor-bound (~per-row cost, near-independent of
    row width — profiled 0.94 ms for 524288x32 AND 524288x12), and the
    backward needs gather(pts, idx) for dkernel. Gathering the 12 extra
    pts channels alongside w here is ~free and deletes the backward's
    second 524288-row gather; the gathered inputs ride to the backward as
    a residual (25 MB at the flagship SA1 — bandwidth noise).
    """
    from pointnet12_tpu.ops.gather import index_points

    hp = jax.lax.Precision.HIGHEST
    w = jax.lax.dot_general(
        pts, kernel, (((2,), (0,)), ((), ())), precision=hp
    ) + bias
    t = jax.lax.dot_general(q, kernel[:3], (((2,), (0,)), ((), ())), precision=hp)
    C1 = kernel.shape[1]
    wp = jnp.concatenate([w, pts], axis=-1)  # (B, N, C1 + C0)
    gwp = index_points(wp, idx)  # (B, S, K, C1 + C0)
    out = gwp[..., :C1] - t[:, :, None, :]
    gp = gwp[..., C1:]  # gathered inputs, saved for dkernel
    return out, (gp, q, idx, kernel)


def _lifted_group_dense_bwd(n_points, res, g):
    gp, q, idx, kernel = res
    C0 = kernel.shape[0]
    C1 = kernel.shape[1]
    hp = jax.lax.Precision.HIGHEST
    B = gp.shape[0]
    gsum_k = jnp.sum(g, axis=2)  # (B, S, C1)

    # scatter-free dkernel from the forward-gathered inputs. The
    # contractions run on FLAT 2-D views — the 4-D einsum made XLA relayout
    # the gathered tensor to the grouped {1,3,2,0} layout first (a 0.43 ms
    # transpose copy at the flagship shape, profiled).
    dkernel = jax.lax.dot_general(
        gp.reshape(-1, C0),
        g.reshape(-1, C1),
        (((0,), (0,)), ((), ())),
        precision=hp,
    )
    dkernel = dkernel.at[:3].add(
        -jax.lax.dot_general(
            q.reshape(-1, 3),
            gsum_k.reshape(-1, C1),
            (((0,), (0,)), ((), ())),
            precision=hp,
        )
    )
    dbias = jnp.sum(g, axis=(0, 1, 2))

    # dpts needs the transpose-gather; dead (and XLA-eliminated) when the
    # input features carry no gradient (SA1). Scatter-free via the one-hot
    # MXU contraction (ops/segsum.py) — XLA's scatter-add is row-serialized
    # (0.89 ms/step for SA2 alone at the flagship shape, profiled).
    from pointnet12_tpu.ops.segsum import segment_matmul

    dw = segment_matmul(
        idx.reshape(B, 1, -1), None, g.reshape(B, -1, C1), n_points
    )
    dpts = jax.lax.dot_general(
        dw, kernel.T, (((2,), (0,)), ((), ())), precision=hp
    )
    dq = -jax.lax.dot_general(
        gsum_k, kernel[:3].T, (((2,), (0,)), ((), ())), precision=hp
    )
    didx = jnp.zeros(idx.shape, jax.dtypes.float0)
    return dpts, dq, didx, dkernel, dbias


_lifted_group_dense.defvjp(_lifted_group_dense_fwd, _lifted_group_dense_bwd)


class GroupedSharedMLP(nn.Module):
    """SharedMLP over ball-query neighborhoods with the FIRST matmul lifted
    out of the gather (TPU optimization; exact up to fp reassociation).

    The reference computes ``dense_0(concat(p[idx] - q, f[idx]))`` on the
    grouped ``(B, S, K, 3+D)`` tensor, which needs TWO 512K-row gathers
    (coordinates + features) plus a matmul over B*S*K rows. Since dense_0
    is linear, it commutes with the gather:

        h1_pre[s, k] = w[idx[s, k]] - t[s]
        w = concat(p, f) @ W1 + b1      (dense over the N points, no gather)
        t = q @ W1[:3]                  (dense over the S centers)

    — ONE gather of (N, C1) rows, and the first matmul shrinks from B*S*K
    to B*N rows. Gathers are descriptor-bound on v5e (~0.9 ms per 512K rows,
    profiled), so halving the gather count is the win.

    The xyz-side matmuls run in fp32 with Precision.HIGHEST: the lift
    computes ``p@W - q@W`` instead of ``(p-q)@W``, and under the default
    bf16 matmul precision the O(1) absolute rounding of ``p@W`` would
    swamp the O(radius) local-frame values after cancellation.

    Parameter tree (dense_i / bn_i) is IDENTICAL to SharedMLP, so torch
    checkpoint import and existing Orbax checkpoints are unaffected.
    Reference: model/pointnet_util.py::PointNetSetAbstraction (SURVEY.md §2).
    """

    features: Sequence[int]
    dtype: Any = jnp.float32
    pool: bool = False  # max over K (pre-ReLU) after the last layer
    # Stochastic rounding for the train-time fp32 -> dtype casts (only
    # meaningful with dtype=bfloat16). Deterministic round-to-nearest
    # biases every cast the same way each step; SR makes the quantization
    # error zero-mean so BN statistics and saved backward residuals stay
    # unbiased. Eval is untouched (deterministic serving).
    sr: bool = False

    def _down(self, x, train: bool):
        """fp32 -> self.dtype activation cast, stochastic in train w/ sr."""
        return _activation_cast(self, x, self.dtype, self.sr, train)

    @nn.compact
    def __call__(
        self,
        xyz,
        feats,
        new_xyz,
        group_idx,
        train: bool = False,
        fused_bq=None,
    ):
        """``fused_bq=(radius, nsample)`` takes the fused eval-SA kernel
        path (kernels/fused_sa_eval.py): ball query + gather + folded MLP +
        K-max in one Pallas call, ``group_idx`` unused (pass None). Only
        valid in eval mode with ``pool=True``."""
        pts = (
            xyz
            if feats is None
            else jnp.concatenate([xyz, feats.astype(xyz.dtype)], axis=-1)
        )
        dense0 = nn.Dense(
            self.features[0],
            name="dense_0",
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )
        dense0(jnp.zeros((1, pts.shape[-1]), jnp.float32))  # create params
        kernel = dense0.variables["params"]["kernel"]  # (3+D, C1) fp32
        bias = dense0.variables["params"]["bias"]
        if fused_bq is not None:
            assert not train and self.pool
            return self._fused_eval(pts, new_xyz, kernel, bias, fused_bq)
        fold = not train  # eval-only folding, see _folded_dense_bn
        if fold:
            # fold eval bn_0 straight into the lifted dense0 weights: with
            # h1 = (pts@W + b)[idx] - q@W[:3], scaling W's columns and
            # adjusting b gives bn(h1) with zero elementwise passes.
            zeros0 = jnp.zeros((self.features[0],), jnp.float32)
            s0, b0 = MomentBN(name="bn_0")(zeros0, zeros0, False)
            kernel = kernel * s0[None, :]
            bias = bias * s0 + b0
        x = _lifted_group_dense(
            pts.shape[1],
            pts.astype(jnp.float32),
            new_xyz.astype(jnp.float32),
            group_idx,
            kernel,
            bias,
        )
        x = self._down(x, train)
        flat_eval = fold and self.pool and EVAL_FLAT_MLP
        if flat_eval:
            Bq, Sq, Kq, _Cq = x.shape
            x = x.reshape(Bq, Sq * Kq, _Cq)

        # NOTE (measured, do not "simplify"): running this stack on a FLAT
        # (B, S*K, C) view to dodge the {1,3,2,0} relayout copies was tried
        # and is 8.5 ms/step SLOWER (27.4 vs 18.9) — XLA's grouped-layout
        # choice is load-bearing for the BN/max fusions; keep 4-D.
        n_layers = len(self.features)
        for i, width in enumerate(self.features):
            last = i == n_layers - 1
            if i == 0:
                if not fold:
                    # train: stock batch-stat BN (folding measured ~2 ms
                    # slower in-step, see _folded_dense_bn); eval: bn_0 was
                    # folded into the lifted dense0 above.
                    x = nn.BatchNorm(
                        use_running_average=False,
                        momentum=BN_MOMENTUM,
                        epsilon=BN_EPS,
                        name=f"bn_{i}",
                        dtype=jnp.float32,
                        param_dtype=jnp.float32,
                    )(x)
                    x = self._down(x, train)
            else:
                dense = nn.Dense(
                    width,
                    name=f"dense_{i}",
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                )
                if fold:
                    # eval: running stats make the fold free — normalize
                    # rides the matmul columns, no elementwise pass over
                    # the (B, S, K, C) tensor.
                    x = _folded_dense_bn(
                        x, dense, MomentBN(name=f"bn_{i}"), False, self.dtype
                    )
                elif fused_bn_stats_enabled():
                    # train, fused-stats experiment: BN moments ride the
                    # matmul epilogue (kernels/bn_stats_fused.py)
                    x = _fused_dense_bn(
                        x, dense, MomentBN(name=f"bn_{i}"), self.dtype
                    )
                    x = self._down(x, train)
                else:
                    x = dense(x)
                    x = nn.BatchNorm(
                        use_running_average=False,
                        momentum=BN_MOMENTUM,
                        epsilon=BN_EPS,
                        name=f"bn_{i}",
                        dtype=jnp.float32,
                        param_dtype=jnp.float32,
                    )(x)
                    x = self._down(x, train)
            if last and self.pool:
                if flat_eval:  # back to grouped 4-D only for the K-max
                    x = x.reshape(Bq, Sq, Kq, -1)
                # max over K commutes with the monotonic ReLU: pooling the
                # pre-ReLU tensor means the last layer's (B, S, K, C)
                # activation is never written back through a ReLU pass.
                x = jnp.max(x, axis=2)
            x = nn.relu(x)
        return x


    def _fused_eval(self, pts, new_xyz, kernel, bias, fused_bq):
        """Fused eval path: fold bn_0 into the lifted dense0, fold bn_i into
        dense_i columns, and run BQ + selection-gather + MLP + K-max in one
        Pallas kernel. Declares dense_i/bn_i in the SAME order as the
        unfused path, so the variable tree (and checkpoints) are identical.
        """
        from pointnet12_tpu.kernels.fused_sa_eval import (
            fused_sa_eval_dense,
            fused_sa_eval_grid,
            fused_sa_eval_ref,
        )

        radius, nsample = fused_bq
        hp = jax.lax.Precision.HIGHEST
        zeros0 = jnp.zeros((self.features[0],), jnp.float32)
        s0, b0 = MomentBN(name="bn_0")(zeros0, zeros0, False)
        kernel0 = kernel * s0[None, :]
        bias0 = bias * s0 + b0
        ptsf = pts.astype(jnp.float32)
        xyz = ptsf[..., :3]
        q = new_xyz.astype(jnp.float32)
        # fp32 HIGHEST: the kernel computes w[idx] - t (cancellation of two
        # large lifted values), same precision care as the lifted train path
        w = (
            jax.lax.dot_general(
                ptsf, kernel0, (((2,), (0,)), ((), ())), precision=hp
            )
            + bias0
        )
        t = jax.lax.dot_general(
            q, kernel0[:3], (((2,), (0,)), ((), ())), precision=hp
        )
        layers = []
        prev_w = self.features[0]
        for i, width in enumerate(self.features[1:], start=1):
            dense = nn.Dense(
                width,
                name=f"dense_{i}",
                dtype=jnp.float32,
                param_dtype=jnp.float32,
            )
            dense(jnp.zeros((1, prev_w), jnp.float32))  # create params
            kern = dense.variables["params"]["kernel"].astype(jnp.float32)
            bs = dense.variables["params"]["bias"].astype(jnp.float32)
            zz = jnp.zeros((width,), jnp.float32)
            si, bi = MomentBN(name=f"bn_{i}")(zz, zz, False)
            layers.append((kern * si[None, :], bs * si + bi))
            prev_w = width
        N, S = xyz.shape[1], q.shape[1]
        use_grid = N >= 2048 and N % 128 == 0 and S % 128 == 0
        kernel_fn = fused_sa_eval_grid if use_grid else fused_sa_eval_dense
        out = kernel_fn(
            radius, nsample, xyz, q, w, t, tuple(layers),
            # force-enabled on CPU (tests): run the kernel interpreted
            interpret=jax.default_backend() != "tpu",
        )
        from pointnet12_tpu.kernels import selfcheck

        if selfcheck.collecting():
            ref = fused_sa_eval_ref(radius, nsample, xyz, q, w, t, tuple(layers))
            ok = selfcheck.boundary_ok_mask(radius, xyz, q)[..., None]
            selfcheck.assert_close("fused_sa_eval", out, ref, ok, atol=5e-3)
        return out.astype(self.dtype)


class SharedMLP(nn.Module):
    """Stack of Dense(+BN)+ReLU layers applied over the last axis.

    Attributes:
      features: output width of each layer.
      use_bn: apply BatchNorm after each Dense (reference always does).
      final_act: apply ReLU after the last layer (reference MLPs do; heads
        that end in logits pass False and add their own tail).
      dtype: compute/activation dtype. bfloat16 halves the HBM traffic of
        the grouped activations (the SA layers' bottleneck on v5e) and
        doubles MXU rate; params and BN statistics stay float32
        (param_dtype below), so this is a pure activation-precision knob.
    """

    features: Sequence[int]
    use_bn: bool = True
    final_act: bool = True
    dtype: Any = jnp.float32
    # Stochastic rounding for the train-time fp32 -> dtype casts (the
    # input downcast and each post-BN recast) — same mechanism and
    # rationale as GroupedSharedMLP.sr: round-to-nearest biases every
    # cast identically step over step; SR keeps the quantization error
    # zero-mean. Eval casts stay deterministic.
    sr: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _activation_cast(self, x, self.dtype, self.sr, train)
        for i, width in enumerate(self.features):
            dense = nn.Dense(
                width,
                name=f"dense_{i}",
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )
            if self.use_bn and not train:
                # eval: fold BN into the matmul columns via running stats
                # (free; big serving win — see _folded_dense_bn).
                x = _folded_dense_bn(
                    x, dense, MomentBN(name=f"bn_{i}"), False, self.dtype
                )
            elif self.use_bn and fused_bn_stats_enabled():
                # train, fused-stats experiment (see knob above)
                x = _fused_dense_bn(
                    x, dense, MomentBN(name=f"bn_{i}"), self.dtype
                )
                x = _activation_cast(self, x, self.dtype, self.sr, train)
            elif self.use_bn:
                # train: stock batch-stat BN (moment-folding measured ~2 ms
                # slower in-step). BN compute dtype PINNED to fp32: with
                # dtype=bf16 the running statistics corrupt and eval-mode
                # quality collapses (measured mIoU 0.18 vs 0.53 on the
                # synthetic seg probe); batch-stat eval was fine, isolating
                # the EMA pathway. Matmuls stay in self.dtype for MXU speed.
                x = dense(x)
                x = nn.BatchNorm(
                    use_running_average=False,
                    momentum=BN_MOMENTUM,
                    epsilon=BN_EPS,
                    name=f"bn_{i}",
                    dtype=jnp.float32,
                    param_dtype=jnp.float32,
                )(x)
                x = _activation_cast(self, x, self.dtype, self.sr, train)
            else:
                x = dense(x)
            if self.final_act or i < len(self.features) - 1:
                x = nn.relu(x)
        return x
