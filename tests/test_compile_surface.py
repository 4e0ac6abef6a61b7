"""Compile-surface tests (SURVEY.md §4.4): the jitted step functions must
not retrace/recompile across steps or batches — static shapes everywhere."""

import jax
import jax.numpy as jnp

from pointnet12_tpu.models import get_model
from pointnet12_tpu.train import (
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

KEY = jax.random.PRNGKey(0)


def test_train_step_single_trace_across_batches():
    model = get_model("pointnet_cls", num_classes=4)
    tx = make_optimizer()
    pts = jax.random.uniform(KEY, (4, 64, 3))
    state = create_train_state(model, KEY, pts, tx)
    step = make_train_step(model, task="cls", num_classes=4)

    for i in range(4):
        batch = {
            "points": jax.random.uniform(jax.random.PRNGKey(i), (4, 64, 3)),
            "label": jnp.full((4,), i % 4, jnp.int32),
        }
        state, _ = step(state, batch, KEY)
    assert step._cache_size() == 1, (
        f"train step retraced: {step._cache_size()} compilations"
    )


def test_eval_step_single_trace():
    model = get_model("pointnet_seg", num_classes=4)
    tx = make_optimizer()
    pts = jax.random.uniform(KEY, (2, 64, 3))
    state = create_train_state(model, KEY, pts, tx)
    estep = make_eval_step(model, task="seg", num_classes=4)
    for i in range(3):
        batch = {
            "points": jax.random.uniform(jax.random.PRNGKey(i), (2, 64, 3)),
            "label": jnp.zeros((2, 64), jnp.int32),
        }
        estep(state, batch)
    assert estep._cache_size() == 1
