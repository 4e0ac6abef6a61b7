"""Convert a reference PyTorch checkpoint (.pth state_dict) into an Orbax
checkpoint loadable by this framework's CLIs and Predictor.

The migration path for users of the PyTorch reference: their trained
weights (SURVEY.md §5 checkpoint format: ``torch.save(model.state_dict())``,
sometimes wrapped in ``{'model_state_dict': ...}``) become a framework
checkpoint with fresh optimizer state.

Example:
  python -m pointnet12_tpu.cli.import_torch \
      --model_name pointnet2_semseg --num_classes 13 \
      --torch_checkpoint best_model.pth --out converted_ckpt
"""

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from pointnet12_tpu.models import get_model
from pointnet12_tpu.train import (
    CheckpointManager,
    create_train_state,
    make_optimizer,
)
from pointnet12_tpu.utils.torch_import import CONVERTERS, input_width


def load_state_dict_numpy(path: str):
    """Load a .pth into plain numpy (CPU, no grad), unwrapping trainers'
    common {'model_state_dict': ...} nesting."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("model_state_dict", "state_dict", "model"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
            break
    return {
        k: v.detach().numpy()
        for k, v in obj.items()
        if hasattr(v, "detach") and "num_batches_tracked" not in k
    }


def main(argv=None):
    p = argparse.ArgumentParser("import_torch")
    p.add_argument("--model_name", type=str, required=True,
                   choices=sorted(CONVERTERS))
    p.add_argument("--num_classes", type=int, required=True)
    p.add_argument("--torch_checkpoint", type=str, required=True)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--num_point", type=int, default=1024)
    p.add_argument("--feature_transform", action="store_true")
    args = p.parse_args(argv)

    sd = load_state_dict_numpy(args.torch_checkpoint)
    kwargs = {}
    if args.model_name in ("pointnet_cls", "pointnet_seg"):
        kwargs["feature_transform"] = args.feature_transform
        variables = CONVERTERS[args.model_name](sd, args.feature_transform)
    else:
        variables = CONVERTERS[args.model_name](sd)

    model = get_model(args.model_name, num_classes=args.num_classes, **kwargs)
    # width derived from the torch weights themselves (first-layer kernel),
    # so e.g. 9-channel pointnet_seg checkpoints import correctly
    width = input_width(args.model_name, variables)
    sample = jnp.zeros((1, args.num_point, width), jnp.float32)
    state = create_train_state(
        model, jax.random.PRNGKey(0), sample, make_optimizer()
    )
    # structural check: converted tree must match the model's
    jax.tree.map(
        lambda a, b: (_ for _ in ()).throw(
            ValueError(f"shape mismatch {a.shape} vs {b.shape}")
        )
        if a.shape != np.asarray(b).shape
        else None,
        state.params,
        variables["params"],
    )
    state = state.replace(
        params=jax.tree.map(jnp.asarray, variables["params"]),
        batch_stats=jax.tree.map(jnp.asarray, variables["batch_stats"]),
    )
    mgr = CheckpointManager(args.out)
    mgr.save(0, state, metrics={"score": 0.0})
    mgr.wait()
    n = sum(x.size for x in jax.tree.leaves(state.params))
    print(
        f"imported {n/1e6:.2f}M params from {args.torch_checkpoint} "
        f"-> {args.out} (step 0)"
    )


if __name__ == "__main__":
    main()
