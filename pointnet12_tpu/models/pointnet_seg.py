"""PointNet semantic segmentation model (BASELINE config 2).

Reference behavior (model/pointnet.py::PointNetSeg / PointNetDenseCls,
SURVEY.md §2): encoder in segmentation mode yields 1088-d per-point features
(1024 global broadcast + 64 point features); pointwise convs
1088->512->256->128->classes with BN+ReLU, per-point log_softmax.
Returns ``(log_probs (B, N, classes), trans_feat)``.
"""

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from pointnet12_tpu.nn.encoder import PointNetEncoder
from pointnet12_tpu.nn.mlp import SharedMLP


class PointNetSeg(nn.Module):
    num_classes: int = 13
    feature_transform: bool = False
    # Activation dtype for encoder + per-point head (params/BN stats fp32;
    # logits cast back to fp32 for a stable log_softmax) — uniform precision
    # API with the pointnet2 models so the CLI flags apply across the zoo.
    dtype: Any = jnp.float32
    sr: bool = False  # stochastic-round train-time bf16 casts (nn/mlp.py)

    @nn.compact
    def __call__(
        self, points: jnp.ndarray, train: bool = False, fps_key=None
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        del fps_key  # signature uniformity; PointNet has no sampling stage
        x, _, trans_feat = PointNetEncoder(
            global_feat=False,
            feature_transform=self.feature_transform,
            dtype=self.dtype,
            sr=self.sr,
            name="feat",
        )(points, train=train)  # (B, N, 1088)
        x = SharedMLP(
            [512, 256, 128], dtype=self.dtype, sr=self.sr, name="head"
        )(x, train=train)
        x = nn.Dense(
            self.num_classes, dtype=self.dtype, param_dtype=jnp.float32,
            name="out",
        )(x)
        x = x.astype(jnp.float32)  # fp32 log_softmax for stable NLL
        return nn.log_softmax(x, axis=-1), trans_feat
