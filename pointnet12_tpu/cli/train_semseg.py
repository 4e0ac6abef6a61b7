"""Semantic-segmentation training CLI (reference: train_semseg.py, SURVEY.md §3.3).

Example:
  python -m pointnet12_tpu.cli.train_semseg --model_name pointnet2 \
      --dataset synthetic --epoch 5 --batchsize 12 --num_point 4096
"""

import argparse

from pointnet12_tpu.cli.common import add_common_args, run_training


def parse_args(argv=None):
    p = argparse.ArgumentParser("train_semseg")
    add_common_args(p, task="seg")
    p.add_argument(
        "--model_name",
        type=str,
        default="pointnet2",
        help="pointnet | pointnet2 (seg variants)",
    )
    p.add_argument("--feature_transform", action="store_true")
    p.add_argument("--dataset", type=str, default="s3dis",
                   choices=["s3dis", "kitti", "kitti_raw", "synthetic"])
    p.add_argument("--num_point", type=int, default=4096)
    p.add_argument("--num_classes", type=int, default=13,
                   help="13 for S3DIS, 20 for Semantic-KITTI")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    best, exp_dir = run_training(args, task="seg")
    print(f"best eval mIoU: {best:.4f} ({exp_dir})")
    return best


if __name__ == "__main__":
    main()
