"""PointNet++ feature-propagation (seg decoder upsampling) layer.

Reference behavior (model/pointnet_util.py::PointNetFeaturePropagation,
SURVEY.md §2): interpolate coarse features to fine points via 3-NN
inverse-distance weighting (``three_nn`` + ``three_interpolate``); if the
coarse set has a single point, broadcast it instead. Concatenate the fine
level's skip features, then a pointwise Conv1d+BN+ReLU stack.
"""

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pointnet12_tpu.nn.mlp import SharedMLP
from pointnet12_tpu.ops.interpolate import three_interpolate, three_nn


class FeaturePropagation(nn.Module):
    """Upsample coarse features to fine points and fuse with skip features."""

    mlp: Sequence[int]
    dtype: Any = jnp.float32
    sr: bool = False  # stochastic-round train-time ``dtype`` casts (SharedMLP.sr)

    @nn.compact
    def __call__(
        self,
        xyz_fine: jnp.ndarray,  # (B, N, 3)
        xyz_coarse: jnp.ndarray,  # (B, M, 3)
        feats_fine: Optional[jnp.ndarray],  # (B, N, D1) skip, or None
        feats_coarse: jnp.ndarray,  # (B, M, D2)
        train: bool = False,
    ) -> jnp.ndarray:
        B, N, _ = xyz_fine.shape
        M = xyz_coarse.shape[1]
        if M == 1:
            interpolated = jnp.broadcast_to(
                feats_coarse, (B, N, feats_coarse.shape[-1])
            )
        else:
            dists, idx = three_nn(xyz_fine, xyz_coarse)
            interpolated = three_interpolate(feats_coarse, idx, dists)

        if feats_fine is not None:
            x = jnp.concatenate([feats_fine, interpolated], axis=-1)
        else:
            x = interpolated
        return SharedMLP(self.mlp, dtype=self.dtype, sr=self.sr, name="mlp")(
            x, train=train
        )
