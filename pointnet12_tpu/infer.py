"""Serving API: checkpoint -> jitted batch predictor.

The reference's eval scripts rebuild the whole training stack to run
inference (SURVEY.md §3.5); this gives deployments a direct path:

    from pointnet12_tpu.infer import Predictor
    p = Predictor.from_checkpoint("pointnet2_semseg", ckpt_dir, num_classes=13)
    labels = p.predict_labels(points)       # (B, N, C) -> (B, N) int32
    log_probs = p(points)                   # (B, N, C) -> (B, N, classes)

The forward is jitted once per input shape (static shapes — feed fixed-size
batches for zero recompiles; `pad_batch` right-pads a short final batch).
Eval-mode (running BN stats, no dropout) with BN weight-folding; measured
2100-2400 clouds/sec for the flagship at B=16, N=4096 on v5e (bench.py
`inference_clouds_per_sec`; cross-session variance ±20%).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class Predictor:
    """Jitted eval-mode forward for any registry model.

    Pass ``mesh=`` (a ``jax.sharding.Mesh`` with a ``data`` axis, e.g.
    ``parallel.mesh.make_mesh()``) to serve data-parallel: the batch is
    sharded over the mesh's data axis and parameters are replicated, so
    one ``predict`` call drives every chip — serving throughput scales
    with the mesh (the model has no cross-cloud compute, so no
    collectives are emitted in the forward). The batch must divide the
    data-axis size.
    """

    def __init__(self, model, variables, mesh=None):
        self._model = model
        self._mesh = mesh
        if mesh is None:
            self._variables = variables
            self._apply = jax.jit(
                lambda v, pts: model.apply(v, pts, train=False)[0]
            )
        else:
            from pointnet12_tpu.parallel import mesh as mesh_lib

            rep = mesh_lib.replicated(mesh)
            self._variables = jax.device_put(variables, rep)
            self._apply = jax.jit(
                lambda v, pts: model.apply(v, pts, train=False)[0],
                in_shardings=(rep, mesh_lib.batch_sharding(mesh)),
            )

    @classmethod
    def from_checkpoint(
        cls,
        model_name: str,
        checkpoint_dir: str,
        num_classes: int,
        sample_points: Optional[jnp.ndarray] = None,
        step: Optional[int] = None,
        mesh=None,
        **model_kwargs,
    ):
        """Restore an Orbax checkpoint written by the training CLIs.

        Template-free: only ``{params, batch_stats}`` are read, so the input
        feature width comes from the checkpoint itself (no name-based width
        heuristic) and checkpoints trained with any optimizer restore fine.
        ``sample_points`` is accepted for API compatibility but no longer
        needed to shape a restore template.
        """
        del sample_points  # width comes from the checkpoint, not a template
        from pointnet12_tpu.models import get_model
        from pointnet12_tpu.train import CheckpointManager

        model = get_model(model_name, num_classes=num_classes, **model_kwargs)
        variables, at = CheckpointManager(checkpoint_dir).restore_variables(
            step=step
        )
        if variables is None:
            raise FileNotFoundError(
                f"no checkpoint found in {checkpoint_dir}"
            )
        return cls(model, variables, mesh=mesh)

    @classmethod
    def from_torch_state_dict(
        cls, model_name: str, state_dict, num_classes: int, mesh=None,
        **model_kwargs,
    ):
        """Serve weights trained with the PyTorch reference directly."""
        from pointnet12_tpu.models import get_model
        from pointnet12_tpu.utils.torch_import import CONVERTERS

        model = get_model(model_name, num_classes=num_classes, **model_kwargs)
        variables = CONVERTERS[model_name](state_dict)
        return cls(model, variables, mesh=mesh)

    def __call__(self, points) -> jnp.ndarray:
        """(B, N, C) -> (B, ..., num_classes) log-probabilities."""
        points = jnp.asarray(points)
        if self._mesh is not None:
            from pointnet12_tpu.parallel.mesh import DATA_AXIS

            n_data = self._mesh.shape[DATA_AXIS]
            if points.shape[0] % n_data != 0:
                raise ValueError(
                    f"batch {points.shape[0]} not divisible by the mesh's "
                    f"{n_data}-way data axis; pad with infer.pad_batch"
                )
        return self._apply(self._variables, points)

    def predict_labels(self, points) -> np.ndarray:
        return np.asarray(jnp.argmax(self(points), axis=-1), np.int32)


def pad_batch(points: np.ndarray, batch_size: int):
    """Right-pad a short batch to `batch_size` (repeat last cloud);
    returns (padded, n_valid) — keeps the jitted shape fixed."""
    n = len(points)
    if n == batch_size:
        return points, n
    reps = np.repeat(points[-1:], batch_size - n, axis=0)
    return np.concatenate([points, reps], axis=0), n
