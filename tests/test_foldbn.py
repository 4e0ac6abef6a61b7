"""Folded Dense+BN (nn/mlp.py::_folded_dense_bn / MomentBN) equivalence.

The production modules fold BN into the matmul columns in EVAL mode (free
via running stats; serving throughput win) and keep stock batch-stat BN in
train mode. These tests pin both the eval fold and the moment-based train
fold (kept for experimentation) against the stock flax Dense+BatchNorm
stack, including the EMA running-statistics update.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pointnet12_tpu.nn.mlp import (
    BN_EPS,
    BN_MOMENTUM,
    MomentBN,
    _folded_dense_bn,
)


class _Folded(nn.Module):
    width: int = 7

    @nn.compact
    def __call__(self, x, train=False):
        dense = nn.Dense(
            self.width, name="dense_0", dtype=jnp.float32,
            param_dtype=jnp.float32,
        )
        return _folded_dense_bn(
            x, dense, MomentBN(name="bn_0"), train, jnp.float32
        )


class _Stock(nn.Module):
    width: int = 7

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Dense(
            self.width, name="dense_0", dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x)
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            name="bn_0",
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x)


def _vars(seed=0, width=7):
    """Shared random params/stats for both module variants."""
    rng = np.random.RandomState(seed)
    return {
        "params": {
            "dense_0": {
                "kernel": jnp.asarray(rng.randn(5, width), jnp.float32),
                "bias": jnp.asarray(rng.randn(width), jnp.float32),
            },
            "bn_0": {
                "scale": jnp.asarray(rng.rand(width) + 0.5, jnp.float32),
                "bias": jnp.asarray(rng.randn(width), jnp.float32),
            },
        },
        "batch_stats": {
            "bn_0": {
                "mean": jnp.asarray(rng.randn(width), jnp.float32),
                "var": jnp.asarray(rng.rand(width) + 0.1, jnp.float32),
            }
        },
    }


def test_eval_fold_matches_stock():
    v = _vars()
    x = jnp.asarray(np.random.RandomState(1).randn(4, 6, 5), jnp.float32)
    got = _Folded().apply(v, x, train=False)
    want = _Stock().apply(v, x, train=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_train_fold_matches_stock_and_updates_ema():
    v = _vars(seed=2)
    x = jnp.asarray(np.random.RandomState(3).randn(8, 12, 5), jnp.float32)
    got, mut_f = _Folded().apply(
        v, x, train=True, mutable=["batch_stats"]
    )
    want, mut_s = _Stock().apply(
        v, x, train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
    )
    for key in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(mut_f["batch_stats"]["bn_0"][key]),
            np.asarray(mut_s["batch_stats"]["bn_0"][key]),
            atol=1e-5,
            rtol=1e-5,
        )


def test_train_fold_gradients_match_stock():
    """The fold is a reparametrization: gradients must agree too."""
    v = _vars(seed=4)
    x = jnp.asarray(np.random.RandomState(5).randn(4, 9, 5), jnp.float32)

    def loss(module, params):
        out, _ = module.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x,
            train=True,
            mutable=["batch_stats"],
        )
        return jnp.sum(out**2)

    g_f = jax.grad(lambda p: loss(_Folded(), p))(v["params"])
    g_s = jax.grad(lambda p: loss(_Stock(), p))(v["params"])
    flat_f = jax.tree.leaves(g_f)
    flat_s = jax.tree.leaves(g_s)
    for a, b in zip(flat_f, flat_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3
        )
