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

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

BN_MOMENTUM = 0.9  # == torch momentum 0.1 (complement convention)
BN_EPS = 1e-5


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

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        for i, width in enumerate(self.features):
            x = nn.Dense(
                width,
                name=f"dense_{i}",
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
            if self.use_bn:
                # BN compute dtype is PINNED to fp32: with dtype=bf16 the
                # running statistics corrupt and eval-mode quality collapses
                # (measured mIoU 0.18 vs 0.53 on the synthetic seg probe);
                # batch-stat eval was fine, isolating the EMA pathway. The
                # matmuls above stay in self.dtype, so MXU speed is kept.
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=BN_MOMENTUM,
                    epsilon=BN_EPS,
                    name=f"bn_{i}",
                    dtype=jnp.float32,
                    param_dtype=jnp.float32,
                )(x)
                x = x.astype(self.dtype)
            if self.final_act or i < len(self.features) - 1:
                x = nn.relu(x)
        return x
