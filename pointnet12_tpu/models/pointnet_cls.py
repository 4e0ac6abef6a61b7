"""PointNet classification model (BASELINE config 1).

Reference behavior (model/pointnet.py::PointNetCls, SURVEY.md §2): the
PointNet encoder's 1024-d global feature through FC 1024->512->256->classes
with BN+ReLU, dropout (p=0.4) inside the second block, and log_softmax.
Returns ``(log_probs, trans_feat)`` — trans_feat feeds the orthogonality
regularizer when the feature transform is enabled.
"""

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from pointnet12_tpu.nn.encoder import PointNetEncoder
from pointnet12_tpu.nn.mlp import BN_EPS, BN_MOMENTUM


class PointNetCls(nn.Module):
    num_classes: int = 40
    feature_transform: bool = False
    dropout_rate: float = 0.4
    # Activation dtype for the encoder (the O(N) work); params/BN stats stay
    # fp32 and the FC head is pinned fp32, matching the pointnet2 models'
    # convention — so the CLI precision flags apply uniformly across the zoo.
    dtype: Any = jnp.float32
    sr: bool = False  # stochastic-round train-time bf16 casts (nn/mlp.py)

    @nn.compact
    def __call__(
        self, points: jnp.ndarray, train: bool = False, fps_key=None
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """points: (B, N, C>=3) channels-last -> ((B, num_classes) log-probs, trans_feat).

        ``fps_key`` is accepted for train-loop signature uniformity with the
        PointNet++ models and ignored (PointNet has no sampling stage).
        """
        del fps_key
        x, _, trans_feat = PointNetEncoder(
            global_feat=True,
            feature_transform=self.feature_transform,
            dtype=self.dtype,
            sr=self.sr,
            name="feat",
        )(points, train=train)
        x = x.astype(jnp.float32)  # head pinned fp32 (B, 1024) — noise-cost
        x = nn.Dense(512, name="fc1")(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            name="bn1",
        )(x)
        x = nn.relu(x)
        x = nn.Dense(256, name="fc2")(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            name="bn2",
        )(x)
        x = nn.relu(x)
        x = nn.Dense(self.num_classes, name="fc3")(x)
        return nn.log_softmax(x, axis=-1), trans_feat
