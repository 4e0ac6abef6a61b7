"""L2 neural modules (Flax).

TPU-native equivalents of the reference's ``nn.Module`` layer (SURVEY.md §2):
the reference's 1x1 ``Conv1d``/``Conv2d`` shared MLPs become ``nn.Dense``
over the trailing feature axis — which XLA lowers to MXU batched matmuls
with the BN scale/shift and ReLU fused into the epilogue.
"""

from pointnet12_tpu.nn.mlp import SharedMLP
from pointnet12_tpu.nn.tnet import TNet
from pointnet12_tpu.nn.encoder import PointNetEncoder
from pointnet12_tpu.nn.set_abstraction import SetAbstraction, SetAbstractionMSG
from pointnet12_tpu.nn.feature_propagation import FeaturePropagation

__all__ = [
    "SharedMLP",
    "TNet",
    "PointNetEncoder",
    "SetAbstraction",
    "SetAbstractionMSG",
    "FeaturePropagation",
]
