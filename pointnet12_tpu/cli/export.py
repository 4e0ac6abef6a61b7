"""Export a trained checkpoint as a self-contained serving artifact.

The reference deploys by shipping the training repo + a .pth checkpoint to
the serving host and rebuilding the model there (SURVEY.md §3.5). The
TPU-native deployment story is ahead-of-time compilation: `jax.export`
serializes the eval-mode forward (BN folded, weights baked in as
constants) into ONE StableHLO blob that a serving host replays with just
jax installed — no flax, no model code, no checkpoint restore, and no
trace/compile at load beyond XLA consuming the pre-lowered module.

The artifact is shape- and platform-pinned: export at the deployment
batch/point count on the deployment platform (on TPU the Pallas/Mosaic
kernels ride along as serialized `tpu_custom_call`s).

Example:
  python -m pointnet12_tpu.cli.export --model_name pointnet2_semseg \
      --checkpoint experiment/seg-.../checkpoints --num_classes 13 \
      --batchsize 16 --num_point 4096 --out model.stablehlo

Serving side:
  from pointnet12_tpu.infer import load_exported   # or inline jax.export
  q = load_exported("model.stablehlo")
  labels = q.predict_labels(points)                # (16, 4096, C) batches
"""

import argparse

from pointnet12_tpu.infer import Predictor


def parse_args(argv=None):
    p = argparse.ArgumentParser("export")
    p.add_argument("--model_name", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--num_classes", type=int, required=True)
    p.add_argument("--batchsize", type=int, default=16)
    p.add_argument("--num_point", type=int, default=4096)
    p.add_argument("--num_features", type=int, default=3,
                   help="input channel count (3 = xyz; 9 for S3DIS blocks)")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: latest)")
    p.add_argument("--out", type=str, required=True)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    predictor = Predictor.from_checkpoint(
        args.model_name,
        args.checkpoint,
        num_classes=args.num_classes,
        step=args.step,
    )
    predictor.save_exported(
        args.out,
        batch_size=args.batchsize,
        num_points=args.num_point,
        num_features=args.num_features,
    )
    print(
        f"exported {args.model_name} -> {args.out} "
        f"(input ({args.batchsize}, {args.num_point}, {args.num_features}))"
    )


if __name__ == "__main__":
    main()
