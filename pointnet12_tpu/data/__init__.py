"""L0 data pipeline: fixed-shape feeders for ModelNet40 / S3DIS /
Semantic-KITTI plus deterministic synthetic twins (SURVEY.md §2, §4.2)."""

from pointnet12_tpu.data import augment
from pointnet12_tpu.data.loader import Feeder
from pointnet12_tpu.data.synthetic import SyntheticModelNet, SyntheticScene


def get_classification_dataset(
    name: str, split: str, num_point: int, data_root: str = "", **kw
):
    if name == "synthetic":
        return SyntheticModelNet(split=split, num_point=num_point, **kw)
    if name == "modelnet40":
        from pointnet12_tpu.data.modelnet40 import ModelNet40H5

        return ModelNet40H5(data_root, split=split, num_point=num_point, **kw)
    if name == "modelnet40_txt":
        from pointnet12_tpu.data.modelnet40 import ModelNet40Txt

        return ModelNet40Txt(data_root, split=split, num_point=num_point, **kw)
    raise KeyError(f"unknown classification dataset {name!r}")


def get_segmentation_dataset(
    name: str, split: str, num_point: int, data_root: str = "", **kw
):
    if name == "synthetic":
        return SyntheticScene(split=split, num_point=num_point, **kw)
    if name == "s3dis":
        from pointnet12_tpu.data.s3dis import S3DISH5

        return S3DISH5(data_root, split=split, num_point=num_point, **kw)
    if name == "kitti":
        from pointnet12_tpu.data.semantic_kitti import SemanticKITTIH5

        return SemanticKITTIH5(data_root, split=split, num_point=num_point, **kw)
    if name == "kitti_raw":
        from pointnet12_tpu.data.semantic_kitti import SemanticKITTIScans

        return SemanticKITTIScans(
            data_root, split=split, num_point=num_point, **kw
        )
    raise KeyError(f"unknown segmentation dataset {name!r}")


__all__ = [
    "augment",
    "Feeder",
    "SyntheticModelNet",
    "SyntheticScene",
    "get_classification_dataset",
    "get_segmentation_dataset",
]
