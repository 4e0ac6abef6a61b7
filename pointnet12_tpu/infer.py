"""Serving API: checkpoint -> jitted batch predictor.

The reference's eval scripts rebuild the whole training stack to run
inference (SURVEY.md §3.5); this gives deployments a direct path:

    from pointnet12_tpu.infer import Predictor
    p = Predictor.from_checkpoint("pointnet2_semseg", ckpt_dir, num_classes=13)
    labels = p.predict_labels(points)       # (B, N, C) -> (B, N) int32
    log_probs = p(points)                   # (B, N, C) -> (B, N, classes)

    # Ahead-of-time deployment artifact (weights baked in, no model code
    # or checkpoint on the serving host — just jax + the blob):
    p.save_exported("model.stablehlo", batch_size=16, num_points=4096)
    q = load_exported("model.stablehlo")    # same __call__/predict_labels

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

    def export_serialized(
        self, batch_size: int, num_points: int, num_features: int = 3
    ) -> bytes:
        """Ahead-of-time compile + serialize the eval forward (jax.export).

        Returns a single self-contained StableHLO artifact: the weights are
        baked in as constants, so deployments load ONE blob and call it with
        `(batch_size, num_points, num_features)` float32 batches — no flax,
        no checkpoint restore, no Python model code on the serving host
        (only jax + the artifact). The artifact is platform-pinned to the
        exporting backend (a TPU export replays the Pallas/Mosaic kernels
        via their serialized `tpu_custom_call`s; export on the deployment
        platform). Use `load_exported` to run it.
        """
        if self._mesh is not None:
            raise ValueError(
                "export captures a single-device forward; build the "
                "Predictor with mesh=None to export, then shard batches "
                "across exported replicas at the serving layer"
            )
        from jax import export as jax_export

        variables = self._variables
        fn = jax.jit(
            lambda pts: self._model.apply(variables, pts, train=False)[0]
        )
        sample = jax.ShapeDtypeStruct(
            (batch_size, num_points, num_features), jnp.float32
        )
        exported = jax_export.export(
            fn,
            # Mosaic (Pallas TPU) kernels lower to `tpu_custom_call`; the
            # kernel payload is serialized inside the artifact, so replaying
            # it on the same platform is safe — opt out of the stability
            # check that would otherwise reject any custom call.
            disabled_checks=[
                jax_export.DisabledSafetyCheck.custom_call("tpu_custom_call")
            ],
        )(sample)
        return bytes(exported.serialize())

    def save_exported(
        self, path, batch_size: int, num_points: int, num_features: int = 3
    ) -> None:
        """`export_serialized` straight to a file (one deployable blob)."""
        blob = self.export_serialized(batch_size, num_points, num_features)
        with open(path, "wb") as f:
            f.write(blob)


class ExportedPredictor:
    """Calls a deserialized `Predictor.export_serialized` artifact.

    Same call surface as `Predictor` (`__call__` -> log-probs,
    `predict_labels`), but the forward is the ahead-of-time compiled
    StableHLO module — no model construction or tracing at load time.
    """

    def __init__(self, exported):
        self._exported = exported
        self._call = jax.jit(exported.call)

    @property
    def input_shape(self):
        """The pinned (batch, points, features) shape the artifact accepts."""
        return tuple(self._exported.in_avals[0].shape)

    def __call__(self, points) -> jnp.ndarray:
        return self._call(jnp.asarray(points, jnp.float32))

    def predict_labels(self, points) -> np.ndarray:
        return np.asarray(jnp.argmax(self(points), axis=-1), np.int32)


def load_exported(source) -> ExportedPredictor:
    """Load an exported artifact from a path or raw bytes."""
    from jax import export as jax_export

    if isinstance(source, (bytes, bytearray)):
        blob = bytes(source)
    else:
        with open(source, "rb") as f:
            blob = f.read()
    return ExportedPredictor(jax_export.deserialize(blob))


def pad_batch(points: np.ndarray, batch_size: int):
    """Right-pad a short batch to `batch_size` (repeat last cloud);
    returns (padded, n_valid) — keeps the jitted shape fixed."""
    n = len(points)
    if n == batch_size:
        return points, n
    reps = np.repeat(points[-1:], batch_size - n, axis=0)
    return np.concatenate([points, reps], axis=0), n
