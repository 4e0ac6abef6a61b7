"""T-Net: the PointNet spatial/feature transformer.

Reference behavior (model/pointnet.py::STN3d / STNkd, SURVEY.md §2):
pointwise convs k->64->128->1024 (BN+ReLU), global max over points, FC
1024->512->256 (BN+ReLU), FC 256->k^2, plus the flattened identity matrix —
the predicted k×k transform starts near identity. The input is then bmm'd by
the transform (done by the caller).
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from pointnet12_tpu.nn.mlp import BN_EPS, BN_MOMENTUM, SharedMLP


class TNet(nn.Module):
    """Predicts a (k, k) alignment transform from a point set.

    Input ``(B, N, k)`` channels-last; output ``(B, k, k)``.

    ``dtype`` governs the pointwise conv stack (the O(N) work); the FC head
    and the predicted transform itself stay fp32 — the transform multiplies
    raw coordinates, and at k*k scalars per cloud the head is compute-noise.
    ``sr`` stochastically rounds the train-time bf16 casts (nn/mlp.py).
    """

    k: int = 3
    dtype: Any = jnp.float32
    sr: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        B = x.shape[0]
        x = SharedMLP(
            [64, 128, 1024], dtype=self.dtype, sr=self.sr, name="mlp"
        )(x, train=train)
        # global max over points -> (B, 1024); FC head pinned fp32
        x = jnp.max(x, axis=1).astype(jnp.float32)
        for i, width in enumerate([512, 256]):
            x = nn.Dense(width, name=f"fc_{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                name=f"fc_bn_{i}",
            )(x)
            x = nn.relu(x)
        x = nn.Dense(
            self.k * self.k,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="fc_out",
        )(x)
        iden = jnp.eye(self.k, dtype=x.dtype).reshape(1, self.k * self.k)
        return (x + iden).reshape(B, self.k, self.k)
