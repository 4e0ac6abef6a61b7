"""PointNet++ set-abstraction layers (SSG and MSG).

Reference behavior (model/pointnet_util.py::PointNetSetAbstraction /
PointNetSetAbstractionMsg, SURVEY.md §2): sample+group, shared MLP over the
grouped ``(B, S, K, C)`` tensor, max-pool over the K neighbors. The MSG
variant runs several (radius, K, mlp) branches at shared FPS centers and
concatenates branch outputs along channels.

TPU-native notes: the grouped tensor stays channels-last so each MLP layer
is one MXU batched matmul ``(B*S*K, C_in) x (C_in, C_out)``; the K-max is a
VPU reduction XLA fuses with the final ReLU. FPS is computed once per layer
and shared across MSG branches.
"""

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointnet12_tpu.nn.mlp import GroupedSharedMLP, SharedMLP
from pointnet12_tpu.ops.ballquery import query_ball_point
from pointnet12_tpu.ops.fps import farthest_point_sample
from pointnet12_tpu.ops.gather import index_points
from pointnet12_tpu.ops.grouping import sample_and_group_all


def _fused_eval_ok(impl: str, n: int, s: int, mlp, train: bool) -> bool:
    """Fused eval-SA kernel dispatch (kernels/fused_sa_eval.py).

    OPT-IN ONLY (``impl="fused"``), measured dead end for auto dispatch:
    the one-hot selection-matmul gather is MXU-tile-count bound — the
    contraction spans ALL candidates (1152 grid-window rows / all N dense)
    for only K=32 selected, a 36x waste, and the per-tile matmuls are
    latency-shaped (2048 small (256,1152)x(1152,33) calls/step). Profiled
    on-chip (round 3): fused flagship eval 12.6 ms vs 6.7 ms unfused
    (fused_sa_eval_grid alone 8.0 ms vs 1.9 ms grid BQ + 0.9 ms XLA
    gather it replaces). Kernels stay correct (verified <=2e-5 at SA1-SA4
    shapes on-chip) for shapes where cw/K is small or future dynamic-gather
    Mosaic support. See docs/PERFORMANCE.md dead-end log."""
    if train or impl != "fused":
        return False
    if s < 8 or len(mlp) < 2:
        return False
    dense_ok = n <= 1024
    grid_ok = n >= 2048 and n % 128 == 0 and s % 128 == 0
    return dense_ok or grid_ok



class SetAbstraction(nn.Module):
    """Single-scale-grouping SA layer (or the final group-all layer).

    Input/output are channels-last: ``xyz (B, N, 3)``, ``feats (B, N, D)`` ->
    ``new_xyz (B, S, 3)``, ``new_feats (B, S, mlp[-1])``.
    """

    npoint: int = 0  # ignored when group_all
    radius: float = 0.0
    nsample: int = 0
    mlp: Sequence[int] = ()
    group_all: bool = False
    impl: str = "auto"
    dtype: Any = jnp.float32
    # Selective precision: dtype for the grouped (B, S, K, C) activation
    # stack only (the SA layers' HBM bottleneck). None = follow ``dtype``.
    # With grouped_dtype=bf16 and dtype=fp32 the grouped tensors store/compute
    # bf16 while the layer's (B, S, C) output — and everything outside the SA
    # stacks — stays fp32 (VERDICT r2 item 4's middle ground).
    grouped_dtype: Any = None
    grouped_sr: bool = False  # stochastic-round the bf16 casts in train

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,
        feats: Optional[jnp.ndarray],
        train: bool = False,
        fps_key: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # impl="fused" opts into the fused eval-SA kernels; the point ops
        # underneath keep their auto dispatch.
        ops_impl = "auto" if self.impl == "fused" else self.impl
        if self.group_all:
            new_xyz, grouped = sample_and_group_all(xyz, feats)
            x = SharedMLP(
                self.mlp, dtype=self.dtype, sr=self.grouped_sr, name="mlp"
            )(grouped, train=train)
            return new_xyz, jnp.max(x, axis=2)  # max over K neighbors
        fps_idx = farthest_point_sample(
            xyz, self.npoint, key=fps_key, impl=ops_impl
        )
        new_xyz = index_points(xyz, fps_idx)  # (B, S, 3)
        gd = self.grouped_dtype if self.grouped_dtype is not None else self.dtype
        if _fused_eval_ok(self.impl, xyz.shape[1], self.npoint, self.mlp, train):
            # serving fast path: BQ + selection-matmul gather + folded MLP +
            # K-max in ONE kernel (kernels/fused_sa_eval.py) — the grouped
            # (B, S, K, C) tensor never leaves VMEM.
            x = GroupedSharedMLP(
                self.mlp, dtype=gd, pool=True, sr=self.grouped_sr, name="mlp"
            )(xyz, feats, new_xyz, None, train=False,
              fused_bq=(self.radius, self.nsample))
            return new_xyz, x.astype(self.dtype)
        group_idx = query_ball_point(
            self.radius, self.nsample, xyz, new_xyz, impl=ops_impl
        )
        # lifted first matmul: one gather instead of two, no grouped
        # (B, S, K, 3+D) input tensor; pool=True does the K-max in-module
        # (pre-ReLU, so the last grouped activation skips the ReLU pass).
        x = GroupedSharedMLP(
            self.mlp, dtype=gd, pool=True, sr=self.grouped_sr, name="mlp"
        )(xyz, feats, new_xyz, group_idx, train=train)
        return new_xyz, x.astype(self.dtype)


class SetAbstractionMSG(nn.Module):
    """Multi-scale-grouping SA layer: shared FPS, per-branch ball query."""

    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]
    impl: str = "auto"
    dtype: Any = jnp.float32
    grouped_dtype: Any = None  # see SetAbstraction.grouped_dtype
    grouped_sr: bool = False  # see SetAbstraction.grouped_sr

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,
        feats: Optional[jnp.ndarray],
        train: bool = False,
        fps_key: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        ops_impl = "auto" if self.impl == "fused" else self.impl
        fps_idx = farthest_point_sample(
            xyz, self.npoint, key=fps_key, impl=ops_impl
        )
        new_xyz = index_points(xyz, fps_idx)  # (B, S, 3)

        gd = self.grouped_dtype if self.grouped_dtype is not None else self.dtype
        fused = _fused_eval_ok(
            self.impl, xyz.shape[1], self.npoint, self.mlp_list[0], train
        )
        branch_outs = []
        for i, (radius, nsample, mlp) in enumerate(
            zip(self.radius_list, self.nsample_list, self.mlp_list)
        ):
            if fused:
                x = GroupedSharedMLP(
                    mlp, dtype=gd, pool=True, sr=self.grouped_sr, name=f"branch_{i}"
                )(xyz, feats, new_xyz, None, train=False,
                  fused_bq=(radius, nsample))
            else:
                group_idx = query_ball_point(
                    radius, nsample, xyz, new_xyz, impl=ops_impl
                )
                x = GroupedSharedMLP(
                    mlp, dtype=gd, pool=True, sr=self.grouped_sr, name=f"branch_{i}"
                )(xyz, feats, new_xyz, group_idx, train=train)
            branch_outs.append(x.astype(self.dtype))
        return new_xyz, jnp.concatenate(branch_outs, axis=-1)
