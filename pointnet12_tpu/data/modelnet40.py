"""ModelNet40 loader (HDF5 `modelnet40_ply_hdf5_2048` format).

Reference behavior (SURVEY.md §2 "ModelNet40 loader"): reads the standard
``ply_data_{train,test}*.h5`` shards (``data`` float32 (S, 2048, 3),
``label`` (S, 1)), listed by ``{train,test}_files.txt``; samples the first
``num_point`` points per cloud and normalizes to the unit sphere.

Output contract: ``__getitem__ -> (points (num_point, 3) float32, label
int32)`` — identical to SyntheticModelNet so CLIs switch with a flag.
"""

import os
from typing import List

import numpy as np

from pointnet12_tpu.data.augment import pc_normalize


def _read_filelist(root: str, split: str) -> List[str]:
    listfile = os.path.join(root, f"{split}_files.txt")
    if os.path.exists(listfile):
        with open(listfile) as f:
            # entries in the stock lists are repo-relative paths
            return [
                os.path.join(root, os.path.basename(line.strip()))
                for line in f
                if line.strip()
            ]
    # fallback: glob shard names directly
    import glob

    return sorted(glob.glob(os.path.join(root, f"ply_data_{split}*.h5")))


class ModelNet40Txt:
    """The resampled-txt ModelNet40 variant (modelnet40_normal_resampled):
    ``<root>/<class>/<class>_NNNN.txt`` rows of ``x,y,z,nx,ny,nz`` with
    ``modelnet40_shape_names.txt`` + ``modelnet40_{train,test}.txt`` splits
    (SURVEY.md §2 "h5 or resampled-txt variant")."""

    def __init__(
        self,
        root: str,
        split: str = "train",
        num_point: int = 1024,
        normalize: bool = True,
        use_normals: bool = False,
    ):
        names_file = os.path.join(root, "modelnet40_shape_names.txt")
        with open(names_file) as f:
            self.classes = {n.strip(): i for i, n in enumerate(f) if n.strip()}
        split_file = os.path.join(root, f"modelnet40_{split}.txt")
        with open(split_file) as f:
            ids = [line.strip() for line in f if line.strip()]
        self.paths = []
        for sid in ids:
            cls = "_".join(sid.split("_")[:-1])
            self.paths.append(
                (os.path.join(root, cls, sid + ".txt"), self.classes[cls])
            )
        self.num_point = num_point
        self.normalize = normalize
        self.use_normals = use_normals

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i: int):
        path, label = self.paths[i]
        pts = np.loadtxt(path, delimiter=",").astype(np.float32)
        pts = pts[: self.num_point]
        if self.normalize:
            pts[:, :3] = pc_normalize(pts[:, :3])
        if not self.use_normals:
            pts = pts[:, :3]
        return pts, np.int32(label)


class ModelNet40H5:
    def __init__(
        self,
        root: str,
        split: str = "train",
        num_point: int = 1024,
        normalize: bool = True,
    ):
        import h5py

        files = _read_filelist(root, split)
        if not files:
            raise FileNotFoundError(
                f"no ModelNet40 h5 shards for split={split!r} under {root!r}"
            )
        datas, labels = [], []
        for fn in files:
            with h5py.File(fn, "r") as f:
                datas.append(f["data"][:].astype(np.float32))
                labels.append(f["label"][:].astype(np.int32).reshape(-1))
        self.data = np.concatenate(datas, axis=0)
        self.label = np.concatenate(labels, axis=0)
        self.num_point = num_point
        self.normalize = normalize

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i: int):
        pts = self.data[i][: self.num_point]
        if self.normalize:
            pts = pc_normalize(pts)
        return pts.astype(np.float32), np.int32(self.label[i])
