"""Classification training CLI (reference: train_clf.py, SURVEY.md §3.1).

Example:
  python -m pointnet12_tpu.cli.train_cls --model_name pointnet2 \
      --dataset synthetic --epoch 10 --batchsize 24 --num_point 1024
"""

import argparse

from pointnet12_tpu.cli.common import add_common_args, run_training


def parse_args(argv=None):
    p = argparse.ArgumentParser("train_cls")
    add_common_args(p, task="cls")
    p.add_argument(
        "--model_name",
        type=str,
        default="pointnet",
        help="pointnet | pointnet2 | pointnet2_cls_ssg | pointnet2_cls_msg",
    )
    p.add_argument("--feature_transform", action="store_true")
    p.add_argument("--dataset", type=str, default="modelnet40",
                   choices=["modelnet40", "modelnet40_txt", "synthetic"])
    p.add_argument("--num_point", type=int, default=1024)
    p.add_argument("--num_classes", type=int, default=40)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    best, exp_dir = run_training(args, task="cls")
    print(f"best eval accuracy: {best:.4f} ({exp_dir})")
    return best


if __name__ == "__main__":
    main()
