"""Semantic-KITTI loader + offline prep (velodyne .bin / .label format).

Reference behavior (SURVEY.md §2 "Semantic-KITTI loader", §3.4): raw scans
are ``sequences/NN/velodyne/*.bin`` (float32 x, y, z, remission) paired with
``sequences/NN/labels/*.label`` (uint32, lower 16 bits = semantic id); raw
ids remap to ~19 train classes via a label map; each scan is subsampled /
padded to a fixed N (static shapes for the jitted step).

``prepare_h5`` is the offline prep tool (reference's h5 preprocessing step):
it walks the sequence tree and writes fixed-shape h5 shards the
:class:`SemanticKITTIH5` dataset reads. :class:`SemanticKITTIScans` reads
the raw tree directly.

Output contract: ``(points (num_point, 4) float32 [xyz, remission],
labels (num_point,) int32)``.
"""

import glob
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

# Standard semantic-kitti.yaml learning_map (raw id -> train id 0..19,
# 0 = unlabeled/ignored). Baked in so no config file is required; a custom
# semantic-kitti.yaml can be supplied via ``label_map_yaml=`` (the
# reference's label-map config path, SURVEY.md §5 flag surface).
LEARNING_MAP: Dict[int, int] = {
    0: 0, 1: 0, 10: 1, 11: 2, 13: 5, 15: 3, 16: 5, 18: 4, 20: 5, 30: 6,
    31: 7, 32: 8, 40: 9, 44: 10, 48: 11, 49: 12, 50: 13, 51: 14, 52: 0,
    60: 9, 70: 15, 71: 16, 72: 17, 80: 18, 81: 19, 99: 0, 252: 1, 253: 7,
    254: 6, 255: 8, 256: 5, 257: 5, 258: 4, 259: 5,
}
NUM_CLASSES = 20  # incl. class 0 = ignored
TRAIN_SEQUENCES = ["00", "01", "02", "03", "04", "05", "06", "07", "09", "10"]
VAL_SEQUENCES = ["08"]


def _build_remap_lut(mapping: Optional[Dict[int, int]] = None) -> np.ndarray:
    mapping = LEARNING_MAP if mapping is None else mapping
    lut = np.zeros(max(mapping) + 1, dtype=np.int32)
    for raw, train in mapping.items():
        lut[raw] = train
    return lut


_REMAP_LUT = _build_remap_lut()


def load_learning_map(yaml_path: str) -> Dict[int, int]:
    """Parse the ``learning_map`` section of a semantic-kitti.yaml (the
    reference lineage's label-map config). Requires pyyaml."""
    import yaml

    with open(yaml_path) as f:
        cfg = yaml.safe_load(f)
    if "learning_map" not in cfg:
        raise KeyError(f"{yaml_path!r} has no 'learning_map' section")
    return {int(k): int(v) for k, v in cfg["learning_map"].items()}


def read_scan(bin_path: str) -> np.ndarray:
    """(P, 4) float32: x, y, z, remission."""
    return np.fromfile(bin_path, dtype=np.float32).reshape(-1, 4)


def read_labels(label_path: str, lut: Optional[np.ndarray] = None) -> np.ndarray:
    """(P,) int32 train ids (lower 16 bits remapped)."""
    lut = _REMAP_LUT if lut is None else lut
    raw = np.fromfile(label_path, dtype=np.uint32) & 0xFFFF
    raw = np.minimum(raw, len(lut) - 1)
    return lut[raw]


def fix_size(
    points: np.ndarray,
    labels: Optional[np.ndarray],
    num_point: int,
    rng: Optional[np.random.RandomState] = None,
):
    """Subsample (without replacement) or pad (with replacement) to num_point."""
    rng = rng or np.random.RandomState(0)
    p = len(points)
    if p >= num_point:
        sel = rng.choice(p, num_point, replace=False)
    else:
        sel = np.concatenate(
            [np.arange(p), rng.choice(p, num_point - p, replace=True)]
        )
    return points[sel], (labels[sel] if labels is not None else None)


def _scan_paths(root: str, sequences: Sequence[str]) -> List[tuple]:
    pairs = []
    for seq in sequences:
        for bin_path in sorted(
            glob.glob(os.path.join(root, "sequences", seq, "velodyne", "*.bin"))
        ):
            stem = os.path.splitext(os.path.basename(bin_path))[0]
            label_path = os.path.join(
                root, "sequences", seq, "labels", stem + ".label"
            )
            pairs.append((bin_path, label_path if os.path.exists(label_path) else None))
    return pairs


class SemanticKITTIScans:
    """Reads the raw sequence tree, fixed-shape output."""

    def __init__(
        self,
        root: str,
        split: str = "train",
        num_point: int = 4096,
        seed: int = 0,
        label_map_yaml: Optional[str] = None,
    ):
        seqs = TRAIN_SEQUENCES if split == "train" else VAL_SEQUENCES
        self.pairs = _scan_paths(root, seqs)
        if not self.pairs:
            raise FileNotFoundError(
                f"no KITTI scans for split={split!r} under {root!r}"
            )
        self.num_point = num_point
        self.seed = seed
        self._lut = (
            _build_remap_lut(load_learning_map(label_map_yaml))
            if label_map_yaml
            else _REMAP_LUT
        )

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, i: int):
        bin_path, label_path = self.pairs[i]
        pts = read_scan(bin_path)
        lbl = (
            read_labels(label_path, self._lut)
            if label_path
            else np.zeros(len(pts), np.int32)
        )
        rng = np.random.RandomState(self.seed + i)
        pts, lbl = fix_size(pts, lbl, self.num_point, rng)
        return pts.astype(np.float32), lbl.astype(np.int32)


def prepare_h5(
    root: str,
    out_dir: str,
    split: str = "train",
    num_point: int = 4096,
    shard_size: int = 256,
    seed: int = 0,
    label_map_yaml: Optional[str] = None,
) -> List[str]:
    """Offline prep: raw sequences -> fixed-shape h5 shards (SURVEY.md §3.4)."""
    import h5py

    ds = SemanticKITTIScans(
        root, split=split, num_point=num_point, seed=seed,
        label_map_yaml=label_map_yaml,
    )
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for shard_start in range(0, len(ds), shard_size):
        idxs = range(shard_start, min(shard_start + shard_size, len(ds)))
        pts = np.stack([ds[i][0] for i in idxs])
        lbl = np.stack([ds[i][1] for i in idxs])
        path = os.path.join(
            out_dir, f"kitti_{split}_{shard_start // shard_size:04d}.h5"
        )
        with h5py.File(path, "w") as f:
            f.create_dataset("data", data=pts, compression="gzip")
            f.create_dataset("label", data=lbl, compression="gzip")
        written.append(path)
    return written


class SemanticKITTIH5:
    """Reads shards written by :func:`prepare_h5`."""

    def __init__(self, root: str, split: str = "train", num_point: int = 4096):
        import h5py

        files = sorted(glob.glob(os.path.join(root, f"kitti_{split}_*.h5")))
        if not files:
            raise FileNotFoundError(
                f"no prepared KITTI shards for split={split!r} under {root!r}"
            )
        datas, labels = [], []
        for fn in files:
            with h5py.File(fn, "r") as f:
                datas.append(f["data"][:].astype(np.float32))
                labels.append(f["label"][:].astype(np.int32))
        self.data = np.concatenate(datas)
        self.label = np.concatenate(labels)
        self.num_point = num_point

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i: int):
        return (
            self.data[i][: self.num_point],
            self.label[i][: self.num_point],
        )
