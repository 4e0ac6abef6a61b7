"""PointNet encoder backbone.

Reference behavior (model/pointnet.py::PointNetEncoder, SURVEY.md §2):
optional input T-Net (3x3) applied to xyz, pointwise conv 3->64 (BN+ReLU),
optional feature T-Net (64x64) applied to the 64-d point features, convs
64->128 and 128->1024 (BN each, ReLU on the first only — the reference has
no ReLU between bn3 and the global max), global max-pool to the 1024-d
global feature. The segmentation variant concatenates the broadcast global
feature with the per-point 64-d features (1088 per point).

Channels-last throughout: input ``(B, N, C)`` with C >= 3; extra channels
beyond xyz (e.g. normals) bypass the input transform, matching the
reference's split/concat behavior.
"""

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from pointnet12_tpu.nn.mlp import (
    BN_EPS,
    BN_MOMENTUM,
    MomentBN,
    _activation_cast,
    _folded_dense_bn,
)
from pointnet12_tpu.nn.tnet import TNet


def _dense_bn(mod, x, width, name, train, dtype=jnp.float32, sr=False):
    dense = nn.Dense(
        width, name=f"{name}", dtype=dtype, param_dtype=jnp.float32
    )
    if not train:
        # eval: fold BN into the matmul columns via running statistics
        # (exact affine; see nn/mlp.py::_folded_dense_bn).
        return _folded_dense_bn(
            x, dense, MomentBN(name=f"{name}_bn"), False, dtype
        )
    # SR the input downcast too: nn.Dense(dtype=bf16) would otherwise
    # round-to-nearest fp32 inputs implicitly (conv1's TNet-transformed
    # xyz, conv2's post-fstn fp32 promotion) — exactly the un-SR'd cast
    # class that collapsed PointNet++ cls training in round 4
    # (docs/QUALITY_PARITY.md bisect). Exact no-op on already-bf16 x.
    x = _activation_cast(mod, x, dtype, sr, train)
    x = dense(x)
    # BN compute pinned fp32 (bf16 BN corrupts running stats, nn/mlp.py);
    # recast after — stochastic in train when sr (unbiased quantization).
    x = nn.BatchNorm(
        use_running_average=False,
        momentum=BN_MOMENTUM,
        epsilon=BN_EPS,
        name=f"{name}_bn",
        dtype=jnp.float32,
        param_dtype=jnp.float32,
    )(x)
    return _activation_cast(mod, x, dtype, sr, train)


class PointNetEncoder(nn.Module):
    """PointNet backbone producing a 1024-d global feature.

    Attributes:
      global_feat: if True return the global feature (classification); else
        return per-point [pointfeat | global] concat (segmentation).
      feature_transform: enable the 64-d feature T-Net.
      input_transform: enable the input (3x3) T-Net.
    """

    global_feat: bool = True
    feature_transform: bool = False
    input_transform: bool = True
    dtype: Any = jnp.float32  # activation dtype; params/BN stats stay fp32
    sr: bool = False  # stochastic-round train-time bf16 casts (nn/mlp.py)

    @nn.compact
    def __call__(
        self, points, train: bool = False
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
        B, N, C = points.shape
        xyz, extra = points[..., :3], points[..., 3:]

        trans = None
        if self.input_transform:
            trans = TNet(k=3, dtype=self.dtype, sr=self.sr, name="stn")(
                xyz, train=train
            )
            xyz = jnp.einsum("bnk,bkj->bnj", xyz, trans)
        x = jnp.concatenate([xyz, extra], axis=-1) if C > 3 else xyz

        x = nn.relu(_dense_bn(self, x, 64, "conv1", train, self.dtype, self.sr))

        trans_feat = None
        if self.feature_transform:
            trans_feat = TNet(
                k=64, dtype=self.dtype, sr=self.sr, name="fstn"
            )(x, train=train)
            # fp32 transform x (possibly bf16) features promotes to fp32;
            # the next _dense_bn casts back down — precision of the learned
            # alignment is preserved at bf16 activation cost elsewhere.
            x = jnp.einsum("bnk,bkj->bnj", x, trans_feat)

        pointfeat = x  # (B, N, 64)
        x = nn.relu(_dense_bn(self, x, 128, "conv2", train, self.dtype, self.sr))
        # no ReLU before global max
        x = _dense_bn(self, x, 1024, "conv3", train, self.dtype, self.sr)
        global_feat = jnp.max(x, axis=1)  # (B, 1024)

        if self.global_feat:
            return global_feat, trans, trans_feat
        # Reference concat order is [global(1024) | pointfeat(64)].
        tiled = jnp.broadcast_to(global_feat[:, None, :], (B, N, 1024))
        return jnp.concatenate([tiled, pointfeat], axis=-1), trans, trans_feat
