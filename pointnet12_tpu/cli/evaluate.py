"""Standalone checkpoint evaluation CLI (reference: test/eval scripts,
SURVEY.md §3.5) — headless metrics dump (accuracy / IoU table), no GUI.

Restores only ``{params, batch_stats}`` (template-free), so checkpoints
trained with any optimizer (``--optimizer sgd`` included) evaluate fine.

Example:
  python -m pointnet12_tpu.cli.evaluate --task seg --model_name pointnet2 \
      --dataset synthetic --checkpoint experiment/seg-.../checkpoints
"""

import argparse
import json

import numpy as np

import jax
import jax.numpy as jnp

from pointnet12_tpu.cli.common import (
    _resolve_model_name,
    evaluate,
    model_precision_kwargs,
)
from pointnet12_tpu.data import (
    Feeder,
    get_classification_dataset,
    get_segmentation_dataset,
)
from pointnet12_tpu.models import get_model
from pointnet12_tpu.train import (
    CheckpointManager,
    create_train_state,
    make_eval_step,
    make_optimizer,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser("evaluate")
    p.add_argument("--task", type=str, required=True, choices=["cls", "seg"])
    p.add_argument("--model_name", type=str, default="pointnet2")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--data_root", type=str, default="")
    p.add_argument("--num_point", type=int, default=None)
    p.add_argument("--num_classes", type=int, default=None)
    p.add_argument("--batchsize", type=int, default=16)
    p.add_argument("--feature_transform", action="store_true")
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--ignore_class", type=int, default=None,
                   help="seg label excluded from loss/accuracy/mIoU")
    p.add_argument("--bf16", action="store_true",
                   help="evaluate with bfloat16 activations (optional "
                        "memory-saving mode; fp32 remains the default — and "
                        "measured-fastest — serving precision, see "
                        "docs/PERFORMANCE.md; params/BN stats stay fp32 so "
                        "any checkpoint restores unchanged)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    task = args.task
    num_point = args.num_point or (1024 if task == "cls" else 4096)
    num_classes = args.num_classes or (40 if task == "cls" else 13)

    # synthetic generators are parameterized by class count (mirrors
    # common.run_training — without this, labels can exceed the model's
    # class count and in-jit gathers clamp silently)
    ds_kw = {"num_classes": num_classes} if args.dataset == "synthetic" else {}
    if task == "cls":
        ds = get_classification_dataset(
            args.dataset, args.split, num_point, args.data_root, **ds_kw
        )
    else:
        ds = get_segmentation_dataset(
            args.dataset, args.split, num_point, args.data_root, **ds_kw
        )
    first_label = np.asarray(ds[0][1])
    if int(first_label.max()) >= num_classes:
        raise ValueError(
            f"dataset labels reach {int(first_label.max())} but the model "
            f"has num_classes={num_classes}; pass --num_classes to match"
        )
    feeder = Feeder(ds, args.batchsize, shuffle=False, pad_last=True)

    model_name = _resolve_model_name(args.model_name, task)
    kwargs = {"num_classes": num_classes}
    if model_name in ("pointnet_cls", "pointnet_seg"):
        kwargs["feature_transform"] = args.feature_transform
    # eval-mode bf16: quality validated by the 40-epoch probe (mIoU 0.5345
    # vs fp32 0.535, docs/PERFORMANCE.md) — eval casts are plain
    # round-to-nearest (SR is train-only, and sr is inert at eval)
    kwargs.update(model_precision_kwargs(model_name, args))
    model = get_model(model_name, **kwargs)

    rng = jax.random.PRNGKey(0)
    sample = jnp.asarray(ds[0][0])[None]
    state = create_train_state(model, rng, sample, make_optimizer())
    variables, step = CheckpointManager(args.checkpoint).restore_variables()
    if variables is None:
        raise FileNotFoundError(f"no checkpoint found in {args.checkpoint}")
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    print(f"restored checkpoint at step {step}")

    eval_step = make_eval_step(
        model, task=task, num_classes=num_classes,
        ignore_class=args.ignore_class,
    )
    out = evaluate(
        state, eval_step, feeder, num_classes, task,
        ignore_class=args.ignore_class,
    )
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
