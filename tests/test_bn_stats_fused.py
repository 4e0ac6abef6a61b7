"""Tests for the fused Dense+BN-stats kernel (kernels/bn_stats_fused.py).

The kernel replaces the train-mode pair {nn.Dense matmul; nn.BatchNorm
stat reduce} with one pass: matmul tiles stream through VMEM while
per-channel sum/sumsq accumulate in scratch. These tests pin (a) the
Pallas kernel (interpret mode on CPU) against the exact jnp reference,
(b) the custom VJP against autodiff of the equivalent composed ops, and
(c) the end-to-end fused train path against the stock nn.BatchNorm path
on a real model (same loss/grads/EMA stats up to fp reassociation).
"""

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree
import numpy as np
import pytest

from pointnet12_tpu.kernels.bn_stats_fused import dense_bn_stats
from pointnet12_tpu.nn import mlp as mlp_lib


SHAPES = [
    ((256, 32), 64),       # flat rows
    ((2, 128, 48), 96),    # (B, N, C) SharedMLP
    ((2, 16, 32, 24), 40), # (B, S, K, C) grouped
]


@pytest.mark.parametrize("xshape,co", SHAPES)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_reference(rng, xshape, co, dtype):
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, xshape, jnp.float32)
    w = jax.random.normal(k2, (xshape[-1], co), jnp.float32) * 0.2
    b = jax.random.normal(k3, (co,), jnp.float32) * 0.1

    yp, mp, vp = dense_bn_stats(x, w, b, out_dtype=dtype, impl="pallas")
    yr, mr, vr = dense_bn_stats(x, w, b, out_dtype=dtype, impl="jnp")
    assert yp.dtype == dtype
    np.testing.assert_allclose(
        np.asarray(yp, np.float32), np.asarray(yr, np.float32),
        atol=1e-2 if dtype == jnp.bfloat16 else 1e-5,
    )
    np.testing.assert_allclose(np.asarray(mp), np.asarray(mr), atol=1e-4)
    np.testing.assert_allclose(np.asarray(vp), np.asarray(vr), atol=1e-4)


def test_moments_match_batchnorm_definition(rng):
    """mean/var must equal the biased batch moments flax BN computes."""
    k1, k2 = jax.random.split(rng)
    x = jax.random.normal(k1, (4, 64, 32), jnp.float32)
    w = jax.random.normal(k2, (32, 48), jnp.float32) * 0.3
    b = jnp.zeros((48,))
    y, mean, var = dense_bn_stats(x, w, b, out_dtype=jnp.float32,
                                  impl="jnp")
    yf = np.asarray(y, np.float64).reshape(-1, 48)
    np.testing.assert_allclose(np.asarray(mean), yf.mean(0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), yf.var(0), atol=1e-5)


@pytest.mark.parametrize("impl", ["jnp", "pallas"])
def test_vjp_matches_autodiff(rng, impl):
    """Custom VJP (incl. the mean/var cotangent folding) == autodiff of
    the same math written in plain jnp."""
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, (2, 64, 16), jnp.float32)
    w = jax.random.normal(k2, (16, 32), jnp.float32) * 0.3
    b = jax.random.normal(k3, (32,), jnp.float32) * 0.1

    def loss_fused(x, w, b):
        y, mean, var = dense_bn_stats(x, w, b, out_dtype=jnp.float32,
                                      impl=impl)
        # consume all three outputs with distinct weights so every
        # cotangent path is exercised
        return (jnp.sum(y * y) * 0.5 + jnp.sum(jnp.sin(mean))
                + jnp.sum(jnp.sqrt(var + 1.0)))

    def loss_plain(x, w, b):
        y = jax.lax.dot_general(
            x, w, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b
        yf = y.reshape(-1, y.shape[-1])
        mean = jnp.mean(yf, axis=0)
        var = jnp.mean(yf * yf, axis=0) - mean * mean
        return (jnp.sum(y * y) * 0.5 + jnp.sum(jnp.sin(mean))
                + jnp.sum(jnp.sqrt(var + 1.0)))

    vf, gf = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    vp, gp = jax.value_and_grad(loss_plain, argnums=(0, 1, 2))(x, w, b)
    assert abs(float(vf) - float(vp)) < 1e-3
    for a, e, tol in zip(gf, gp, (2e-4, 2e-3, 2e-4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=tol)


def test_fused_train_path_matches_stock(rng):
    """End-to-end: pointnet2_semseg train forward+grads with the fused
    stats knob on (jnp impl on CPU) matches the stock nn.BatchNorm path —
    same variable tree, loss/grads/EMA stats equal up to reassociation."""
    from pointnet12_tpu.models import get_model

    num_classes, B, N = 6, 2, 1024
    pts = jax.random.uniform(rng, (B, N, 9))
    lbl = jnp.zeros((B, N), jnp.int32)
    model = get_model("pointnet2_semseg", num_classes=num_classes,
                      impl="jnp")
    variables = model.init({"params": rng}, pts[:1], train=False)

    def run():
        def loss_fn(params):
            (logp, _), mut = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                pts, train=True, fps_key=None,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(7)},
            )
            nll = -jnp.mean(
                jnp.take_along_axis(logp, lbl[..., None], -1)
            )
            return nll, mut["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        return loss, bs, grads

    mlp_lib.set_fused_bn_stats(False)
    loss_a, bs_a, g_a = run()
    try:
        mlp_lib.set_fused_bn_stats(True)
        loss_b, bs_b, g_b = run()
    finally:
        mlp_lib.set_fused_bn_stats(False)

    assert abs(float(loss_a) - float(loss_b)) < 1e-4
    flat_a = jax.tree.leaves(bs_a)
    flat_b = jax.tree.leaves(bs_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    ga = np.asarray(ravel_pytree(g_a)[0])
    gb = np.asarray(ravel_pytree(g_b)[0])
    # fp reassociation in the fused stats can flip K-max argmax ties,
    # rerouting a handful of per-point gradients (same phenomenon as
    # tests/test_train_parity.py) — bound the tail, not every element
    diff = np.abs(ga - gb)
    assert np.mean(diff > 5e-3) < 1e-4, np.sort(diff)[-5:]
    assert diff.max() < 5e-2, diff.max()
