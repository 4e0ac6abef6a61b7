"""S3DIS loader (`indoor3d_sem_seg_hdf5_data` format).

Reference behavior (SURVEY.md §2 "S3DIS loader"): scans pre-blocked into
1m x 1m columns of 4096 points with 9-dim features (xyz, rgb, normalized
xyz) and 13 classes, stored as ``ply_data_all_*.h5`` shards (``data``
(S, 4096, 9), ``label`` (S, 4096)) with ``room_filelist.txt`` mapping each
block to its Area; Area-``test_area`` is held out for eval.

Output contract: ``(points (num_point, 9) float32, labels (num_point,)
int32)`` — identical to SyntheticScene.
"""

import glob
import os

import numpy as np

NUM_CLASSES = 13


class S3DISH5:
    def __init__(
        self,
        root: str,
        split: str = "train",
        test_area: int = 5,
        num_point: int = 4096,
    ):
        import h5py

        files = sorted(glob.glob(os.path.join(root, "ply_data_all_*.h5")))
        if not files:
            raise FileNotFoundError(f"no S3DIS h5 shards under {root!r}")
        datas, labels = [], []
        for fn in files:
            with h5py.File(fn, "r") as f:
                datas.append(f["data"][:].astype(np.float32))
                labels.append(f["label"][:].astype(np.int32))
        data = np.concatenate(datas, axis=0)
        label = np.concatenate(labels, axis=0)

        room_list = os.path.join(root, "room_filelist.txt")
        if os.path.exists(room_list):
            with open(room_list) as f:
                rooms = [line.strip() for line in f if line.strip()]
            is_test = np.array(
                [f"Area_{test_area}" in r for r in rooms], dtype=bool
            )
        else:  # no room map: deterministic 80/20 block split
            is_test = np.arange(len(data)) % 5 == 0
        keep = is_test if split in ("test", "eval") else ~is_test
        self.data = data[keep]
        self.label = label[keep]
        self.num_point = num_point

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i: int):
        return (
            self.data[i][: self.num_point],
            self.label[i][: self.num_point],
        )
