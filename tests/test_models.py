"""Forward-pass contract tests for the five model configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnet12_tpu.models import MODEL_REGISTRY, get_model

KEY = jax.random.PRNGKey(0)

CASES = [
    # name, (B, N, C), num_classes, out_rank
    ("pointnet_cls", (2, 256, 3), 10, 2),
    ("pointnet_seg", (2, 256, 3), 5, 3),
    ("pointnet2_cls_ssg", (2, 512, 3), 10, 2),
    ("pointnet2_cls_msg", (2, 512, 3), 10, 2),
    ("pointnet2_semseg", (2, 1024, 9), 5, 3),
]


@pytest.mark.parametrize("name,shape,nc,rank", CASES)
def test_forward_shapes_and_logprobs(name, shape, nc, rank):
    model = get_model(name, num_classes=nc)
    pts = jax.random.uniform(KEY, shape)
    variables = model.init({"params": KEY}, pts, train=False)
    logp, _ = model.apply(variables, pts, train=False)
    expected = (shape[0], nc) if rank == 2 else (shape[0], shape[1], nc)
    assert logp.shape == expected
    # log_softmax output: probabilities sum to 1
    np.testing.assert_allclose(
        np.asarray(jnp.exp(logp).sum(-1)), 1.0, atol=1e-4
    )


@pytest.mark.parametrize("name,shape,nc,rank", CASES)
def test_backward_finite_all_models(name, shape, nc, rank):
    """Gradients flow through every model (incl. the lifted-first-matmul
    custom VJP in SSG and MSG SA layers) and are finite."""
    model = get_model(name, num_classes=nc)
    pts = jax.random.uniform(KEY, shape)
    variables = model.init({"params": KEY}, pts, train=False)
    labels = (
        jnp.zeros(shape[0], jnp.int32)
        if rank == 2
        else jnp.zeros(shape[:2], jnp.int32)
    )

    def loss_fn(params):
        (logp, _), _ = model.apply(
            {"params": params, **{k: v for k, v in variables.items() if k != "params"}},
            pts, train=True, mutable=["batch_stats"],
            rngs={"dropout": KEY},
        )
        picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)
        return -jnp.mean(picked)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(g**2)) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_registry_aliases():
    assert type(get_model("pointnet")).__name__ == "PointNetCls"
    assert type(get_model("pointnet2")).__name__ == "PointNet2ClsSSG"
    assert set(MODEL_REGISTRY) == {
        "pointnet_cls",
        "pointnet_seg",
        "pointnet2_cls_ssg",
        "pointnet2_cls_msg",
        "pointnet2_semseg",
    }


def test_feature_transform_returns_trans_feat():
    model = get_model("pointnet_cls", num_classes=5, feature_transform=True)
    pts = jax.random.uniform(KEY, (2, 128, 3))
    variables = model.init({"params": KEY}, pts, train=False)
    _, trans_feat = model.apply(variables, pts, train=False)
    assert trans_feat.shape == (2, 64, 64)
    # zero-init final layer => exact identity at init
    np.testing.assert_allclose(
        np.asarray(trans_feat), np.broadcast_to(np.eye(64), (2, 64, 64)),
        atol=1e-6,
    )


def test_eval_deterministic():
    model = get_model("pointnet2_cls_ssg", num_classes=5)
    pts = jax.random.uniform(KEY, (2, 512, 3))
    variables = model.init({"params": KEY}, pts, train=False)
    a, _ = model.apply(variables, pts, train=False)
    b, _ = model.apply(variables, pts, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_extra_channels_cls():
    """Cls models accept normals (C=6) like the reference."""
    model = get_model("pointnet_cls", num_classes=5)
    pts = jax.random.uniform(KEY, (2, 128, 6))
    variables = model.init({"params": KEY}, pts, train=False)
    logp, _ = model.apply(variables, pts, train=False)
    assert logp.shape == (2, 5)


def test_grouped_dtype_selective_bf16():
    """grouped_dtype=bf16 (VERDICT r3 item 4): SA grouped stacks run bf16
    while the layer outputs, FP decoder and head stay fp32; params/BN stats
    stay fp32; outputs track the fp32 model within bf16 tolerance."""
    kw = dict(num_classes=5, impl="jnp")
    m32 = get_model("pointnet2_semseg", **kw)
    m16 = get_model("pointnet2_semseg", grouped_dtype=jnp.bfloat16, **kw)
    pts = jax.random.uniform(KEY, (2, 1024, 9))
    v = m32.init({"params": KEY}, pts, train=False)
    # identical parameter trees (grouped_dtype is activation-only)
    v16 = m16.init({"params": KEY}, pts, train=False)
    assert jax.tree.all(
        jax.tree.map(lambda a, b: a.dtype == b.dtype == jnp.float32
                     or a.dtype == b.dtype, v["params"], v16["params"])
    )
    lp32, _ = m32.apply(v, pts, train=False)
    lp16, _ = m16.apply(v, pts, train=False)
    assert lp16.dtype == jnp.float32
    # bf16 grouped stacks perturb logits but must stay close at init
    assert float(jnp.max(jnp.abs(lp16 - lp32))) < 0.15

    def loss16(p):
        (lp, _), _ = m16.apply(
            {"params": p, "batch_stats": v16["batch_stats"]}, pts,
            train=True, mutable=["batch_stats"], rngs={"dropout": KEY},
        )
        return -lp.mean()

    g = jax.grad(loss16)(v16["params"])
    leaves = jax.tree.leaves(g)
    assert all(x.dtype == jnp.float32 for x in leaves)  # fp32 master grads
    assert all(bool(jnp.isfinite(x).all()) for x in leaves)
