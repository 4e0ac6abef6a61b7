"""PointNet++ classification models, SSG and MSG (BASELINE configs 3 & 4).

Reference behavior (model/pointnet2.py::PointNet2ClsSsg / PointNet2ClsMsg,
SURVEY.md §2), hyperparameters standard across the lineage:

SSG:  SA(512, r=0.2, K=32, [64,64,128]) -> SA(128, r=0.4, K=64,
      [128,128,256]) -> SA(group_all, [256,512,1024]) -> FC 512 -> 256 ->
      classes with BN/ReLU/Dropout(0.4), log_softmax.
MSG:  SA_MSG(512, r=[0.1,0.2,0.4], K=[16,32,128],
      [[32,32,64],[64,64,128],[64,96,128]]) ->
      SA_MSG(128, r=[0.2,0.4,0.8], K=[32,64,128],
      [[64,64,128],[128,128,256],[128,128,256]]) ->
      SA(group_all, [256,512,1024]) -> same FC head.

``fps_key`` randomizes the FPS start point (the reference's torch.randint);
None gives a deterministic start for eval/parity.
"""

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointnet12_tpu.nn.mlp import BN_EPS, BN_MOMENTUM
from pointnet12_tpu.nn.set_abstraction import SetAbstraction, SetAbstractionMSG


def _subkey(key: Optional[jax.Array], i: int) -> Optional[jax.Array]:
    return None if key is None else jax.random.fold_in(key, i)


class _ClsHead(nn.Module):
    num_classes: int
    dropout_rate: float = 0.4

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, width in enumerate([512, 256]):
            x = nn.Dense(width, name=f"fc{i + 1}")(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                name=f"bn{i + 1}",
            )(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, name="fc3")(x)
        return nn.log_softmax(x, axis=-1)


class PointNet2ClsSSG(nn.Module):
    num_classes: int = 40
    impl: str = "auto"
    dtype: Any = jnp.float32
    grouped_dtype: Any = None  # bf16 SA grouped stacks only; see SetAbstraction
    grouped_sr: bool = False  # stochastic-round bf16 casts in train
    # Uniform precision API with PointNet2SemSeg: every dtype-cast in the
    # cls models lives inside the SA stacks (grouped + group_all), all
    # governed by grouped_sr; the head is pinned fp32. Accepted so the CLI
    # can pass one kwarg set across model families.
    sr: bool = False

    @nn.compact
    def __call__(
        self,
        points: jnp.ndarray,
        train: bool = False,
        fps_key: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, None]:
        xyz, feats = points[..., :3], points[..., 3:]
        if feats.shape[-1] == 0:
            feats = None
        xyz, feats = SetAbstraction(
            512, 0.2, 32, [64, 64, 128], impl=self.impl, dtype=self.dtype,
            grouped_dtype=self.grouped_dtype, grouped_sr=self.grouped_sr, name="sa1"
        )(xyz, feats, train=train, fps_key=_subkey(fps_key, 1))
        xyz, feats = SetAbstraction(
            128, 0.4, 64, [128, 128, 256], impl=self.impl, dtype=self.dtype,
            grouped_dtype=self.grouped_dtype, grouped_sr=self.grouped_sr, name="sa2"
        )(xyz, feats, train=train, fps_key=_subkey(fps_key, 2))
        _, feats = SetAbstraction(
            mlp=[256, 512, 1024], group_all=True, dtype=self.dtype,
            grouped_sr=self.grouped_sr, name="sa3"
        )(xyz, feats, train=train)
        logp = _ClsHead(self.num_classes, name="head")(
            feats[:, 0].astype(jnp.float32), train=train
        )
        return logp, None


class PointNet2ClsMSG(nn.Module):
    num_classes: int = 40
    impl: str = "auto"
    dtype: Any = jnp.float32
    grouped_dtype: Any = None  # bf16 SA grouped stacks only; see SetAbstraction
    grouped_sr: bool = False  # stochastic-round bf16 casts in train
    # Uniform precision API with PointNet2SemSeg: every dtype-cast in the
    # cls models lives inside the SA stacks (grouped + group_all), all
    # governed by grouped_sr; the head is pinned fp32. Accepted so the CLI
    # can pass one kwarg set across model families.
    sr: bool = False

    @nn.compact
    def __call__(
        self,
        points: jnp.ndarray,
        train: bool = False,
        fps_key: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, None]:
        xyz, feats = points[..., :3], points[..., 3:]
        if feats.shape[-1] == 0:
            feats = None
        xyz, feats = SetAbstractionMSG(
            512,
            [0.1, 0.2, 0.4],
            [16, 32, 128],
            [[32, 32, 64], [64, 64, 128], [64, 96, 128]],
            impl=self.impl,
            dtype=self.dtype,
            grouped_dtype=self.grouped_dtype, grouped_sr=self.grouped_sr,
            name="sa1",
        )(xyz, feats, train=train, fps_key=_subkey(fps_key, 1))
        xyz, feats = SetAbstractionMSG(
            128,
            [0.2, 0.4, 0.8],
            [32, 64, 128],
            [[64, 64, 128], [128, 128, 256], [128, 128, 256]],
            impl=self.impl,
            dtype=self.dtype,
            grouped_dtype=self.grouped_dtype, grouped_sr=self.grouped_sr,
            name="sa2",
        )(xyz, feats, train=train, fps_key=_subkey(fps_key, 2))
        _, feats = SetAbstraction(
            mlp=[256, 512, 1024], group_all=True, dtype=self.dtype,
            grouped_sr=self.grouped_sr, name="sa3"
        )(xyz, feats, train=train)
        logp = _ClsHead(self.num_classes, name="head")(
            feats[:, 0].astype(jnp.float32), train=train
        )
        return logp, None
