"""Semantic-KITTI offline prep CLI (reference prep script, SURVEY.md §3.4).

Converts raw sequences (velodyne .bin + .label) into fixed-shape h5 shards.

Example:
  python -m pointnet12_tpu.cli.prepare_kitti --root /data/semantic-kitti \
      --out /data/kitti_h5 --split train --num_point 4096
"""

import argparse

from pointnet12_tpu.data.semantic_kitti import prepare_h5


def main(argv=None):
    p = argparse.ArgumentParser("prepare_kitti")
    p.add_argument("--root", type=str, required=True)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--split", type=str, default="train",
                   choices=["train", "val"])
    p.add_argument("--num_point", type=int, default=4096)
    p.add_argument("--shard_size", type=int, default=256)
    p.add_argument("--label_map", type=str, default=None,
                   help="semantic-kitti.yaml with a learning_map section "
                        "(default: the baked-in standard map)")
    args = p.parse_args(argv)
    written = prepare_h5(
        args.root, args.out, split=args.split,
        num_point=args.num_point, shard_size=args.shard_size,
        label_map_yaml=args.label_map,
    )
    print(f"wrote {len(written)} shards:")
    for w in written:
        print(" ", w)


if __name__ == "__main__":
    main()
