"""Kernel self-check sanitizer (kernels/selfcheck.py).

The sanitizer double-computes dispatched ops against their jnp twins and
reports divergence via a trace-time count collector returned as ordinary
jit outputs (SURVEY.md §5 sanitizer story; neither host callbacks nor
checkify survive this box's backend + Pallas kernels — see the module
docstring). These tests exercise the comparison machinery directly (CPU)
and the end-to-end wiring through checked train/eval steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnet12_tpu.kernels import selfcheck
from pointnet12_tpu.ops.ballquery import _ballquery_jnp


def test_assert_match_passes_on_equal():
    a = jnp.arange(12).reshape(3, 4)
    selfcheck.wrap(lambda x: selfcheck.assert_match("t", x, x))(a)


def test_assert_match_raises_on_divergence():
    a = jnp.arange(12).reshape(3, 4)
    b = a.at[1, 2].set(99)
    f = selfcheck.wrap(lambda x, y: selfcheck.assert_match("t", x, y))
    with pytest.raises(selfcheck.KernelMismatchError, match="selfcheck"):
        f(a, b)


def test_assert_match_respects_ok_mask():
    a = jnp.arange(12).reshape(3, 4)
    b = a.at[1, 2].set(99)
    ok = jnp.ones((3, 4), bool).at[1, 2].set(False)
    selfcheck.wrap(lambda x, y: selfcheck.assert_match("t", x, y, ok))(a, b)


def test_assert_match_noop_outside_collector():
    # outside a collect scope the ops' checks are free no-ops
    a = jnp.arange(4)
    assert selfcheck.assert_match("t", a, a + 1) is None
    assert not selfcheck.collecting()


def test_boundary_ok_mask_flags_boundary_rows():
    radius = 0.5
    xyz = jnp.zeros((1, 3, 3)).at[0, 1].set(
        jnp.array([radius, 0.0, 0.0])  # exactly on the boundary of q0
    ).at[0, 2].set(jnp.array([10.0, 10.0, 10.0]))
    new_xyz = jnp.stack(
        [jnp.zeros((3,)), jnp.array([20.0, 20.0, 20.0])]
    )[None]
    ok = np.asarray(selfcheck.boundary_ok_mask(radius, xyz, new_xyz))
    assert not ok[0, 0]  # a point sits on q0's boundary
    assert ok[0, 1]  # far query: no boundary points


def test_selfcheck_ballquery_machinery_clean():
    """Interpret-mode kernel vs jnp twin passes through assert_match."""
    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (2, 256, 3))
    q = xyz[:, :32]
    from pointnet12_tpu.kernels.ballquery_pallas import ballquery_pallas

    got = ballquery_pallas(0.2, 8, xyz, q, interpret=True)
    ref = _ballquery_jnp(0.2, 8, xyz, q)
    ok = selfcheck.boundary_ok_mask(0.2, xyz, q)[..., None]
    selfcheck.wrap(
        lambda g, r, m: selfcheck.assert_match("bq", g, r, m)
    )(got, ref, ok)


def test_selfcheck_steps_end_to_end():
    """Checked train + eval steps run clean with selfcheck forced on
    (jnp dispatch on CPU makes the kernel checks structural no-ops, but
    the shadow-forward plumbing, collector scoping around value_and_grad,
    and host raise path are all real)."""
    from pointnet12_tpu.models import get_model
    from pointnet12_tpu.train import create_train_state, make_optimizer
    from pointnet12_tpu.train.loop import make_eval_step, make_train_step

    selfcheck.set_selfcheck(True)
    try:
        model = get_model("pointnet2_semseg", num_classes=5)
        key = jax.random.PRNGKey(0)
        pts = jax.random.uniform(key, (2, 1024, 9))
        labels = jax.random.randint(key, (2, 1024), 0, 5)
        tx = make_optimizer("adam", steps_per_epoch=10)
        state = create_train_state(model, key, pts[:1], tx)
        step = make_train_step(model, task="seg", num_classes=5)
        state, m = step(state, {"points": pts, "label": labels}, key)
        assert np.isfinite(float(m["loss"]))
        ev = make_eval_step(model, task="seg", num_classes=5)
        em = ev(state, {"points": pts, "label": labels})
        assert np.isfinite(float(em["loss"]))
    finally:
        selfcheck.set_selfcheck(None)


def test_selfcheck_env_flag(monkeypatch):
    monkeypatch.setenv("POINTNET12_TPU_SELFCHECK", "1")
    assert selfcheck.selfcheck_enabled()
    monkeypatch.setenv("POINTNET12_TPU_SELFCHECK", "0")
    assert not selfcheck.selfcheck_enabled()
    selfcheck.set_selfcheck(True)
    try:
        assert selfcheck.selfcheck_enabled()
    finally:
        selfcheck.set_selfcheck(None)
