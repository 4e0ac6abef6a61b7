"""L3 model zoo — the five BASELINE configs (BASELINE.json:6-12).

Registry keys mirror the reference's ``--model_name`` flag values plus
explicit variants:
  pointnet_cls       PointNet classification (config 1)
  pointnet_seg       PointNet semantic segmentation (config 2)
  pointnet2_cls_ssg  PointNet++ SSG classification (config 3)
  pointnet2_cls_msg  PointNet++ MSG classification (config 4)
  pointnet2_semseg   PointNet++ semantic segmentation (config 5)
The reference's bare ``pointnet``/``pointnet2`` aliases map to the cls
variants in the cls CLI and seg variants in the seg CLI.
"""

from typing import Any, Dict

from pointnet12_tpu.models.pointnet_cls import PointNetCls
from pointnet12_tpu.models.pointnet_seg import PointNetSeg
from pointnet12_tpu.models.pointnet2_cls import PointNet2ClsMSG, PointNet2ClsSSG
from pointnet12_tpu.models.pointnet2_semseg import PointNet2SemSeg

MODEL_REGISTRY: Dict[str, Any] = {
    "pointnet_cls": PointNetCls,
    "pointnet_seg": PointNetSeg,
    "pointnet2_cls_ssg": PointNet2ClsSSG,
    "pointnet2_cls_msg": PointNet2ClsMSG,
    "pointnet2_semseg": PointNet2SemSeg,
}


def get_model(name: str, **kwargs):
    """Build a model by registry name (reference --model_name aliases accepted)."""
    aliases = {
        "pointnet": "pointnet_cls",
        "pointnet2": "pointnet2_cls_ssg",
        "pointnet2_msg": "pointnet2_cls_msg",
    }
    name = aliases.get(name, name)
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[name](**kwargs)


__all__ = [
    "PointNetCls",
    "PointNetSeg",
    "PointNet2ClsSSG",
    "PointNet2ClsMSG",
    "PointNet2SemSeg",
    "MODEL_REGISTRY",
    "get_model",
]
