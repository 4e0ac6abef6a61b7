"""PointNet++ semantic segmentation model (BASELINE config 5).

Reference behavior (model/pointnet2.py::PointNet2SemSeg, SURVEY.md §2):
encoder SA(1024, 0.1, 32, [32,32,64]) -> SA(256, 0.2, 32, [64,64,128]) ->
SA(64, 0.4, 32, [128,128,256]) -> SA(16, 0.8, 32, [256,256,512]); decoder
FP4 [256,256] -> FP3 [256,256] -> FP2 [256,128] -> FP1 [128,128,128] (no skip
at the input level); head: pointwise 128->128 (BN+ReLU+Dropout 0.5) ->
classes, per-point log_softmax. Input features are the full channel vector
(e.g. 9-dim for S3DIS: xyz, rgb, normalized-xyz), coordinates its first 3.
"""

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointnet12_tpu.nn.feature_propagation import FeaturePropagation
from pointnet12_tpu.nn.mlp import BN_EPS, BN_MOMENTUM, _activation_cast
from pointnet12_tpu.nn.set_abstraction import SetAbstraction


def _subkey(key: Optional[jax.Array], i: int) -> Optional[jax.Array]:
    return None if key is None else jax.random.fold_in(key, i)


class PointNet2SemSeg(nn.Module):
    num_classes: int = 13
    dropout_rate: float = 0.5
    impl: str = "auto"
    dtype: Any = jnp.float32
    # bf16 for the grouped SA (B, S, K, C) stacks only (HBM bottleneck);
    # FP decoder / heads / BN inputs outside SA stay in ``dtype``.
    grouped_dtype: Any = None
    grouped_sr: bool = False  # stochastic-round bf16 casts in train
    # Stochastic rounding for the train-time casts of ``dtype`` itself
    # (FP decoder SharedMLP stacks + the head's post-BN cast). Pair with
    # dtype=bfloat16 for the full-bf16 SR config (--bf16 --bf16_sr);
    # no-op at dtype=fp32.
    sr: bool = False

    @nn.compact
    def __call__(
        self,
        points: jnp.ndarray,
        train: bool = False,
        fps_key: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, None]:
        """points: (B, N, C>=3) -> ((B, N, num_classes) log-probs, None)."""
        l0_xyz = points[..., :3]
        l0_feats = points  # reference feeds the full channel vector

        l1_xyz, l1 = SetAbstraction(
            1024, 0.1, 32, [32, 32, 64], impl=self.impl, dtype=self.dtype,
            grouped_dtype=self.grouped_dtype, grouped_sr=self.grouped_sr, name="sa1"
        )(l0_xyz, l0_feats, train=train, fps_key=_subkey(fps_key, 1))
        l2_xyz, l2 = SetAbstraction(
            256, 0.2, 32, [64, 64, 128], impl=self.impl, dtype=self.dtype,
            grouped_dtype=self.grouped_dtype, grouped_sr=self.grouped_sr, name="sa2"
        )(l1_xyz, l1, train=train, fps_key=_subkey(fps_key, 2))
        l3_xyz, l3 = SetAbstraction(
            64, 0.4, 32, [128, 128, 256], impl=self.impl, dtype=self.dtype,
            grouped_dtype=self.grouped_dtype, grouped_sr=self.grouped_sr, name="sa3"
        )(l2_xyz, l2, train=train, fps_key=_subkey(fps_key, 3))
        l4_xyz, l4 = SetAbstraction(
            16, 0.8, 32, [256, 256, 512], impl=self.impl, dtype=self.dtype,
            grouped_dtype=self.grouped_dtype, grouped_sr=self.grouped_sr, name="sa4"
        )(l3_xyz, l3, train=train, fps_key=_subkey(fps_key, 4))

        l3 = FeaturePropagation(
            [256, 256], dtype=self.dtype, sr=self.sr, name="fp4"
        )(l3_xyz, l4_xyz, l3, l4, train=train)
        l2 = FeaturePropagation(
            [256, 256], dtype=self.dtype, sr=self.sr, name="fp3"
        )(l2_xyz, l3_xyz, l2, l3, train=train)
        l1 = FeaturePropagation(
            [256, 128], dtype=self.dtype, sr=self.sr, name="fp2"
        )(l1_xyz, l2_xyz, l1, l2, train=train)
        l0 = FeaturePropagation(
            [128, 128, 128], dtype=self.dtype, sr=self.sr, name="fp1"
        )(l0_xyz, l1_xyz, None, l1, train=train)

        x = nn.Dense(128, dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(l0)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            name="bn1",
            # fp32: bf16 BN corrupts running stats (see nn/mlp.py)
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x)
        x = _activation_cast(self, x, self.dtype, self.sr, train)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=self.dtype, param_dtype=jnp.float32, name="conv2")(x)
        x = x.astype(jnp.float32)  # fp32 log_softmax for stable NLL
        return nn.log_softmax(x, axis=-1), None
