"""Jitted train/eval steps (L4).

Reference behavior (SURVEY.md §3.1): per-batch host loop around
forward/NLL/backward/Adam with per-epoch eval. TPU-native design: the whole
cloud->logits->loss->grads->update path is ONE jitted XLA program per step —
the only host<->device traffic is the input batch (H2D) and scalar metrics
(D2H), mirroring the reference's three boundaries but with zero intra-step
roundtrips [BASELINE.json:5].

With a ``Mesh``, the same step function shards the batch over the ``data``
axis and replicates parameters; XLA inserts the gradient all-reduce over ICI.
Donation of the incoming state buffers keeps the update in-place in HBM.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import core, struct

from pointnet12_tpu.parallel import mesh as mesh_lib
from pointnet12_tpu.train import losses as losses_lib
from pointnet12_tpu.train import metrics as metrics_lib


class TrainState(struct.PyTreeNode):
    """Model params + BN stats + optimizer state, one pytree."""

    step: jnp.ndarray
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def create_train_state(
    model, rng, sample_points: jnp.ndarray, tx
) -> TrainState:
    variables = model.init({"params": rng}, sample_points, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", core.FrozenDict())
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )


def _point_mask(labels, task: str, ignore_class: Optional[int]):
    """Per-element validity mask matching ``labels``' shape, or None."""
    if task != "seg" or ignore_class is None:
        return None
    return (labels != ignore_class).astype(jnp.float32)


def build_train_step(
    model,
    task: str = "cls",
    num_classes: int = 40,
    class_weight: Optional[jnp.ndarray] = None,
    ignore_class: Optional[int] = None,
):
    """The raw (unjitted) train step — for composition (bench scan loops,
    custom jit wrappers). Most callers want :func:`make_train_step`.

    batch: ``{"points": (B, N, C), "label": (B,) | (B, N)}``.
    ``ignore_class``: segmentation label excluded from loss and accuracy
    (e.g. Semantic-KITTI class 0 = unlabeled; SURVEY.md §2 KITTI loader).
    Returns ``(new_state, metrics_dict)``.
    """

    def train_step(state: TrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        dropout_rng, fps_rng = jax.random.split(step_rng)
        mask = _point_mask(batch["label"], task, ignore_class)

        def loss_fn(params):
            (log_probs, trans_feat), mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["points"],
                train=True,
                fps_key=fps_rng,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            if task == "cls":
                loss = losses_lib.classification_loss(
                    log_probs, batch["label"], trans_feat
                )
            else:
                loss = losses_lib.segmentation_loss(
                    log_probs,
                    batch["label"],
                    trans_feat,
                    class_weight=class_weight,
                    mask=mask,
                )
            return loss, (log_probs, mutated["batch_stats"])

        (loss, (log_probs, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads, new_bs)
        metrics = {
            "loss": loss,
            "accuracy": metrics_lib.accuracy(
                log_probs, batch["label"], mask=mask
            ),
        }
        return new_state, metrics

    return train_step


def make_train_step(
    model,
    task: str = "cls",
    num_classes: int = 40,
    class_weight: Optional[jnp.ndarray] = None,
    mesh=None,
    ignore_class: Optional[int] = None,
):
    """Jitted (and optionally mesh-sharded) train step."""
    train_step = build_train_step(
        model,
        task=task,
        num_classes=num_classes,
        class_weight=class_weight,
        ignore_class=ignore_class,
    )
    from pointnet12_tpu.kernels import selfcheck

    if selfcheck.selfcheck_enabled():
        # Sanitizer mode (debug; ~2x cost, donation skipped). The kernel
        # checks run in a SHADOW no-grad forward with the same rng folding
        # as the real step — tracers created under value_and_grad could
        # not escape as jit outputs — then the unchecked step runs.
        def checked_step(state, batch, rng):
            step_rng = jax.random.fold_in(rng, state.step)
            dropout_rng, fps_rng = jax.random.split(step_rng)
            with selfcheck.collect() as items:
                state.apply_fn(
                    {
                        "params": state.params,
                        "batch_stats": state.batch_stats,
                    },
                    batch["points"],
                    train=True,
                    fps_key=fps_rng,
                    mutable=["batch_stats"],
                    rngs={"dropout": dropout_rng},
                )
            counts = {f"{i}:{n}": c for i, (n, c) in enumerate(items)}
            new_state, metrics = train_step(state, batch, rng)
            return new_state, metrics, counts

        jstep = jax.jit(checked_step)

        def host_step(state, batch, rng):
            new_state, metrics, counts = jstep(state, batch, rng)
            selfcheck.raise_if_any(counts)
            return new_state, metrics

        return host_step
    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))
    repl = mesh_lib.replicated(mesh)
    data = mesh_lib.batch_sharding(mesh)
    # `data` as a prefix sharding covers every leaf of the batch dict
    # (points/label/mask) regardless of which optional keys are present.
    return jax.jit(
        train_step,
        donate_argnums=(0,),
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
    )


def make_eval_step(
    model,
    task: str = "cls",
    num_classes: int = 40,
    mesh=None,
    ignore_class: Optional[int] = None,
):
    """Jitted eval step: masked loss/accuracy, confusion matrix, and the
    number of valid elements (``count``) so the caller can aggregate exact
    full-set metrics across padded tail batches (batch key ``"mask"`` is the
    (B,) cloud-validity vector emitted by ``Feeder(pad_last=True)``)."""

    def eval_step(state: TrainState, batch):
        log_probs, trans_feat = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["points"],
            train=False,
        )
        labels = batch["label"]
        mask = _point_mask(labels, task, ignore_class)  # per-point or None
        cloud_mask = batch.get("mask")  # (B,) padded-tail validity or None
        if cloud_mask is not None:
            cm_b = cloud_mask.astype(jnp.float32)
            expand = cm_b if labels.ndim == 1 else cm_b[:, None]
            mask = expand if mask is None else mask * expand
        if mask is not None:
            # full labels shape, not (B, 1): confusion_matrix flattens it
            mask = jnp.broadcast_to(mask, labels.shape)
        loss = losses_lib.nll_loss(log_probs, labels, mask=mask)
        pred = jnp.argmax(log_probs, axis=-1)
        cm = metrics_lib.confusion_matrix(pred, labels, num_classes, mask=mask)
        count = (
            jnp.sum(mask)
            if mask is not None
            else jnp.asarray(labels.size, jnp.float32)
        )
        return {
            "loss": loss,
            "accuracy": metrics_lib.accuracy(log_probs, labels, mask=mask),
            "confusion": cm,
            "count": count,
        }

    from pointnet12_tpu.kernels import selfcheck

    if selfcheck.selfcheck_enabled():
        # sanitizer mode: eval has no inner grad transform, so the checks
        # ride the real ops directly (no shadow pass needed)
        return selfcheck.wrap(eval_step)
    if mesh is None:
        return jax.jit(eval_step)
    repl = mesh_lib.replicated(mesh)
    data = mesh_lib.batch_sharding(mesh)
    return jax.jit(
        eval_step,
        in_shardings=(repl, data),
        out_shardings=repl,
    )
