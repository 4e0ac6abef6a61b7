"""Headless segmentation visualization (reference: open3d viewer scripts,
SURVEY.md §3.5 — no GUI on a TPU box, so predictions are dumped as ASCII PLY
files, colored by predicted class, viewable in any point-cloud tool).

Example:
  python -m pointnet12_tpu.cli.visualize --model_name pointnet2 \
      --dataset synthetic --checkpoint experiment/.../checkpoints \
      --out /tmp/viz --num_clouds 4
"""

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from pointnet12_tpu.cli.common import _resolve_model_name
from pointnet12_tpu.data import get_segmentation_dataset
from pointnet12_tpu.models import get_model
from pointnet12_tpu.train import CheckpointManager

# 20-entry categorical palette (RGB uint8), cycled for higher class counts
_PALETTE = np.array(
    [
        [ 31, 119, 180], [255, 127,  14], [ 44, 160,  44], [214,  39,  40],
        [148, 103, 189], [140,  86,  75], [227, 119, 194], [127, 127, 127],
        [188, 189,  34], [ 23, 190, 207], [174, 199, 232], [255, 187, 120],
        [152, 223, 138], [255, 152, 150], [197, 176, 213], [196, 156, 148],
        [247, 182, 210], [199, 199, 199], [219, 219, 141], [158, 218, 229],
    ],
    dtype=np.uint8,
)


def write_ply(path: str, xyz: np.ndarray, labels: np.ndarray):
    """ASCII PLY with per-vertex class colors (no external deps)."""
    colors = _PALETTE[labels % len(_PALETTE)]
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(xyz)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        )
        f.write("end_header\n")
        for p, c in zip(xyz, colors):
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} {c[0]} {c[1]} {c[2]}\n")


def main(argv=None):
    p = argparse.ArgumentParser("visualize")
    p.add_argument("--model_name", type=str, default="pointnet2")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--data_root", type=str, default="")
    p.add_argument("--num_point", type=int, default=4096)
    p.add_argument("--num_classes", type=int, default=13)
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--num_clouds", type=int, default=4)
    args = p.parse_args(argv)

    ds_kw = {"num_classes": args.num_classes} if args.dataset == "synthetic" else {}
    ds = get_segmentation_dataset(
        args.dataset, args.split, args.num_point, args.data_root, **ds_kw
    )
    model = get_model(
        _resolve_model_name(args.model_name, "seg"),
        num_classes=args.num_classes,
    )
    # template-free restore: params+batch_stats only, any-optimizer ckpts OK
    variables, step = CheckpointManager(args.checkpoint).restore_variables()
    if variables is None:
        raise FileNotFoundError(f"no checkpoint found in {args.checkpoint}")
    print(f"restored checkpoint at step {step}")

    apply = jax.jit(lambda pts: model.apply(variables, pts, train=False)[0])
    os.makedirs(args.out, exist_ok=True)
    for i in range(min(args.num_clouds, len(ds))):
        pts, gt = ds[i]
        pred = np.asarray(jnp.argmax(apply(jnp.asarray(pts)[None])[0], -1))
        xyz = pts[:, :3]
        write_ply(os.path.join(args.out, f"cloud{i:03d}_pred.ply"), xyz, pred)
        write_ply(
            os.path.join(args.out, f"cloud{i:03d}_gt.ply"),
            xyz,
            np.asarray(gt),
        )
        acc = float((pred == np.asarray(gt)).mean())
        print(f"cloud {i}: per-point acc {acc:.3f} -> {args.out}/cloud{i:03d}_*.ply")


if __name__ == "__main__":
    main()
