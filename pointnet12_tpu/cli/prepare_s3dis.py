"""S3DIS offline prep: raw Stanford3dDataset annotations -> blocked h5.

The reference consumed the pre-made ``indoor3d_sem_seg_hdf5_data`` (1m x 1m
columns of 4096 points, 9-dim features; SURVEY.md §2 "S3DIS loader"); this
tool produces that format from the raw dataset tree::

    <root>/Area_N/<room>/Annotations/<class>_K.txt   # rows: x y z r g b

Pipeline per room: concat annotation files (label = class name), then cut
the floor plan into 1m x 1m blocks, sample each block to ``num_point``
points with 9-dim features [xyz(room-local), rgb/255, xyz normalized by the
room extent], and write ``ply_data_all_*.h5`` shards + ``room_filelist.txt``
consumable by :class:`pointnet12_tpu.data.s3dis.S3DISH5`.

Example:
  python -m pointnet12_tpu.cli.prepare_s3dis --root /data/Stanford3dDataset \
      --out /data/s3dis_h5 --num_point 4096
"""

import argparse
import glob
import os

import numpy as np

CLASS_NAMES = [
    "ceiling", "floor", "wall", "beam", "column", "window", "door",
    "table", "chair", "sofa", "bookcase", "board", "clutter",
]
_CLASS_TO_ID = {n: i for i, n in enumerate(CLASS_NAMES)}
BLOCK = 1.0  # meters
STRIDE = 1.0


def load_room(room_dir: str):
    """(P, 6) xyzrgb + (P,) labels from a room's Annotations/*.txt."""
    pts, lbl = [], []
    for ann in sorted(glob.glob(os.path.join(room_dir, "Annotations", "*.txt"))):
        cls = os.path.basename(ann).split("_")[0]
        cid = _CLASS_TO_ID.get(cls, _CLASS_TO_ID["clutter"])
        data = np.loadtxt(ann).reshape(-1, 6)
        pts.append(data)
        lbl.append(np.full(len(data), cid, np.int32))
    if not pts:
        raise FileNotFoundError(f"no annotation files under {room_dir!r}")
    return np.concatenate(pts).astype(np.float32), np.concatenate(lbl)


def room_to_blocks(
    pts: np.ndarray,
    lbl: np.ndarray,
    num_point: int,
    rng: np.random.RandomState,
    min_points: int = 100,
):
    """Cut a room into 1m x 1m xy-blocks of fixed-size 9-dim samples."""
    xyz = pts[:, :3] - pts[:, :3].min(0)  # room-local coords
    rgb = pts[:, 3:6] / 255.0
    extent = np.maximum(xyz.max(0), 1e-6)
    nx = max(int(np.ceil(xyz[:, 0].max() / STRIDE)), 1)
    ny = max(int(np.ceil(xyz[:, 1].max() / STRIDE)), 1)
    blocks_pts, blocks_lbl = [], []
    for bx in range(nx):
        for by in range(ny):
            x0, y0 = bx * STRIDE, by * STRIDE
            sel = (
                (xyz[:, 0] >= x0) & (xyz[:, 0] < x0 + BLOCK)
                & (xyz[:, 1] >= y0) & (xyz[:, 1] < y0 + BLOCK)
            )
            idxs = np.where(sel)[0]
            if len(idxs) < min_points:
                continue
            take = rng.choice(idxs, num_point, replace=len(idxs) < num_point)
            feats = np.concatenate(
                [xyz[take], rgb[take], xyz[take] / extent], axis=1
            )
            blocks_pts.append(feats.astype(np.float32))
            blocks_lbl.append(lbl[take])
    return blocks_pts, blocks_lbl


def main(argv=None):
    import h5py

    p = argparse.ArgumentParser("prepare_s3dis")
    p.add_argument("--root", type=str, required=True)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--num_point", type=int, default=4096)
    p.add_argument("--shard_size", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    rng = np.random.RandomState(args.seed)
    os.makedirs(args.out, exist_ok=True)
    all_pts, all_lbl, rooms = [], [], []
    room_dirs = sorted(glob.glob(os.path.join(args.root, "Area_*", "*")))
    room_dirs = [d for d in room_dirs if os.path.isdir(d)]
    if not room_dirs:
        raise FileNotFoundError(f"no Area_*/room dirs under {args.root!r}")
    for room_dir in room_dirs:
        area = os.path.basename(os.path.dirname(room_dir))
        room = os.path.basename(room_dir)
        pts, lbl = load_room(room_dir)
        bp, bl = room_to_blocks(pts, lbl, args.num_point, rng)
        all_pts.extend(bp)
        all_lbl.extend(bl)
        rooms.extend([f"{area}_{room}"] * len(bp))
        print(f"{area}/{room}: {len(bp)} blocks")

    data = np.stack(all_pts)
    label = np.stack(all_lbl)
    n_shards = 0
    for s0 in range(0, len(data), args.shard_size):
        path = os.path.join(args.out, f"ply_data_all_{n_shards:04d}.h5")
        with h5py.File(path, "w") as f:
            f.create_dataset(
                "data", data=data[s0 : s0 + args.shard_size], compression="gzip"
            )
            f.create_dataset(
                "label", data=label[s0 : s0 + args.shard_size], compression="gzip"
            )
        n_shards += 1
    with open(os.path.join(args.out, "room_filelist.txt"), "w") as f:
        f.write("\n".join(rooms) + "\n")
    print(f"wrote {len(data)} blocks in {n_shards} shards to {args.out}")


if __name__ == "__main__":
    main()
