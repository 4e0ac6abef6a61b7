"""Training-loop tests: loss decreases, checkpoint roundtrip, losses/metrics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from pointnet12_tpu.data import Feeder, SyntheticModelNet, SyntheticScene
from pointnet12_tpu.models import get_model
from pointnet12_tpu.train import (
    CheckpointManager,
    create_train_state,
    losses,
    make_eval_step,
    make_optimizer,
    make_train_step,
    metrics,
)

KEY = jax.random.PRNGKey(0)


# ------------------------------------------------------------------ losses


def test_nll_loss_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(8, 5).astype(np.float32)
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits)))
    labels = rng.randint(0, 5, 8)
    got = float(losses.nll_loss(jnp.asarray(logp), jnp.asarray(labels)))
    want = float(
        F.nll_loss(torch.from_numpy(logp), torch.from_numpy(labels).long())
    )
    assert abs(got - want) < 1e-5


def test_nll_loss_class_weight_matches_torch():
    rng = np.random.RandomState(1)
    logp = np.log(
        rng.dirichlet(np.ones(5), size=8).astype(np.float32) + 1e-9
    )
    labels = rng.randint(0, 5, 8)
    w = rng.uniform(0.5, 2.0, 5).astype(np.float32)
    got = float(
        losses.nll_loss(jnp.asarray(logp), jnp.asarray(labels), jnp.asarray(w))
    )
    want = float(
        F.nll_loss(
            torch.from_numpy(logp),
            torch.from_numpy(labels).long(),
            weight=torch.from_numpy(w),
        )
    )
    assert abs(got - want) < 1e-5


def test_transform_regularizer_zero_for_orthogonal():
    eye = jnp.broadcast_to(jnp.eye(16), (4, 16, 16))
    assert float(losses.feature_transform_regularizer(eye)) < 1e-4
    skew = eye * 2.0
    assert float(losses.feature_transform_regularizer(skew)) > 1.0


# ----------------------------------------------------------------- metrics


def test_confusion_and_iou():
    pred = jnp.asarray([0, 0, 1, 1, 2, 2])
    true = jnp.asarray([0, 1, 1, 1, 2, 0])
    cm = metrics.confusion_matrix(pred, true, 3)
    want = np.array([[1, 0, 1], [1, 2, 0], [0, 0, 1]], np.float32)
    np.testing.assert_array_equal(np.asarray(cm), want)
    iou, miou, acc = metrics.iou_from_confusion(cm)
    np.testing.assert_allclose(
        np.asarray(iou), [1 / 3, 2 / 3, 1 / 2], atol=1e-6
    )
    assert abs(float(acc) - 4 / 6) < 1e-6


# ------------------------------------------------------------ train steps


def test_cls_training_reduces_loss():
    ds = SyntheticModelNet("train", num_point=128, num_classes=4, size=64)
    feeder = Feeder(ds, batch_size=16, shuffle=True, prefetch=False)
    model = get_model("pointnet_cls", num_classes=4)
    tx = make_optimizer("adam", learning_rate=1e-3, steps_per_epoch=4)
    state = create_train_state(
        model, KEY, jnp.asarray(ds[0][0])[None], tx
    )
    train_step = make_train_step(model, task="cls", num_classes=4)
    hist = []
    for _ in range(8):
        for batch in feeder:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, m = train_step(state, batch, KEY)
            hist.append(float(m["loss"]))
    assert np.mean(hist[-4:]) < 0.6 * np.mean(hist[:4])


def test_seg_training_step_runs_and_evals():
    ds = SyntheticScene("train", num_point=1024, num_classes=6, size=8)
    model = get_model("pointnet2_semseg", num_classes=6, impl="jnp")
    tx = make_optimizer("adam", steps_per_epoch=2)
    state = create_train_state(model, KEY, jnp.asarray(ds[0][0])[None], tx)
    train_step = make_train_step(model, task="seg", num_classes=6)
    eval_step = make_eval_step(model, task="seg", num_classes=6)
    batch = {
        "points": jnp.stack([jnp.asarray(ds[i][0]) for i in range(2)]),
        "label": jnp.stack([jnp.asarray(ds[i][1]) for i in range(2)]),
    }
    state, m = train_step(state, batch, KEY)
    assert np.isfinite(float(m["loss"]))
    em = eval_step(state, batch)
    assert em["confusion"].shape == (6, 6)
    # confusion totals == number of labeled points
    assert float(jnp.sum(em["confusion"])) == 2 * 1024


def test_sgd_optimizer_runs():
    model = get_model("pointnet_cls", num_classes=4)
    tx = make_optimizer("sgd", learning_rate=1e-2)
    pts = jax.random.uniform(KEY, (4, 64, 3))
    state = create_train_state(model, KEY, pts, tx)
    train_step = make_train_step(model, task="cls", num_classes=4)
    batch = {"points": pts, "label": jnp.asarray([0, 1, 2, 3])}
    state2, m = train_step(state, batch, KEY)
    assert int(state2.step) == 1 and np.isfinite(float(m["loss"]))


# ------------------------------------------------------------- checkpoints


def test_checkpoint_roundtrip(tmp_path):
    model = get_model("pointnet_cls", num_classes=4)
    tx = make_optimizer()
    pts = jax.random.uniform(KEY, (2, 64, 3))
    state = create_train_state(model, KEY, pts, tx)
    train_step = make_train_step(model, task="cls", num_classes=4)
    batch = {"points": pts, "label": jnp.asarray([0, 1])}
    state, _ = train_step(state, batch, KEY)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, state, metrics={"score": 0.5})
    mgr.wait()

    fresh = create_train_state(model, KEY, pts, tx)
    mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
    restored, step = mgr2.restore(fresh)
    assert step == 1
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state.params,
        restored.params,
    )
    assert int(restored.step) == int(state.step)
