"""Serving API tests: checkpoint and torch-weight predictors."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from pointnet12_tpu.infer import Predictor, pad_batch
from pointnet12_tpu.models import get_model
from pointnet12_tpu.train import (
    CheckpointManager,
    create_train_state,
    make_optimizer,
)


def test_predictor_from_checkpoint(tmp_path):
    model = get_model("pointnet_cls", num_classes=4)
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (2, 128, 3))
    state = create_train_state(model, key, pts[:1], make_optimizer())
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(0, state, metrics={"score": 0.0})
    mgr.wait()

    p = Predictor.from_checkpoint(
        "pointnet_cls", str(tmp_path), num_classes=4, sample_points=pts[:1]
    )
    logp = p(pts)
    assert logp.shape == (2, 4)
    want, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        pts,
        train=False,
    )
    np.testing.assert_allclose(np.asarray(logp), np.asarray(want), atol=1e-6)
    labels = p.predict_labels(pts)
    assert labels.shape == (2,) and labels.dtype == np.int32


def test_predictor_from_torch_weights():
    from tests.torch_ref import models_torch

    torch.manual_seed(0)
    tmodel = models_torch.PointNetCls(num_classes=5)
    tmodel.eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    p = Predictor.from_torch_state_dict("pointnet_cls", sd, num_classes=5)

    rng = np.random.RandomState(0)
    pts = rng.randn(2, 128, 3).astype(np.float32)
    with torch.no_grad():
        want, _ = tmodel(torch.from_numpy(pts).permute(0, 2, 1))
    np.testing.assert_allclose(
        np.asarray(p(pts)), want.numpy(), atol=2e-4, rtol=2e-4
    )


def test_predictor_data_parallel_matches_single_device():
    """mesh= serving: batch sharded over the data axis, same predictions."""
    from pointnet12_tpu.parallel.mesh import DATA_AXIS, make_mesh

    model = get_model("pointnet2_semseg", num_classes=5)
    key = jax.random.PRNGKey(1)
    # N=1024 is the model's minimum (SA1 samples 1024 centers)
    pts = jax.random.uniform(key, (8, 1024, 9))
    variables = model.init({"params": key}, pts[:1], train=False)

    single = Predictor(model, variables)
    mesh = make_mesh()
    assert mesh.shape[DATA_AXIS] == 8
    sharded = Predictor(model, variables, mesh=mesh)

    out = sharded(pts)
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(single(pts)), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_array_equal(
        sharded.predict_labels(pts), single.predict_labels(pts)
    )
    with np.testing.assert_raises_regex(ValueError, "not divisible"):
        sharded(pts[:3])

    # the documented short-batch path: pad to the mesh width, slice back
    padded, n = pad_batch(np.asarray(pts[:3]), 8)
    np.testing.assert_allclose(
        np.asarray(sharded(padded))[:n],
        np.asarray(single(pts[:3])),
        atol=1e-5,
        rtol=1e-5,
    )


def test_pad_batch():
    pts = np.ones((3, 16, 3), np.float32)
    padded, n = pad_batch(pts, 8)
    assert padded.shape == (8, 16, 3) and n == 3
    same, n2 = pad_batch(pts, 3)
    assert same is pts and n2 == 3


def test_predictor_bf16_serving_dtype(tmp_path):
    """Predictor(dtype=bf16) restores an fp32 checkpoint unchanged (params
    and BN stats are pinned fp32 under any dtype) and tracks the fp32
    predictor within bf16 tolerance — the fast serving configuration
    (converged quality evidence: the 40-epoch probe, docs/PERFORMANCE.md)."""
    model = get_model("pointnet2_semseg", num_classes=5, impl="jnp")
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (2, 1024, 9))
    state = create_train_state(model, key, pts[:1], make_optimizer())
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(0, state, metrics={"score": 0.0})
    mgr.wait()

    p32 = Predictor.from_checkpoint(
        "pointnet2_semseg", str(tmp_path), num_classes=5, impl="jnp"
    )
    p16 = Predictor.from_checkpoint(
        "pointnet2_semseg", str(tmp_path), num_classes=5, impl="jnp",
        dtype=jnp.bfloat16,
    )
    lp32, lp16 = np.asarray(p32(pts)), np.asarray(p16(pts))
    assert lp16.dtype == np.float32
    assert float(np.max(np.abs(lp16 - lp32))) < 0.2
    agree = (lp16.argmax(-1) == lp32.argmax(-1)).mean()
    assert agree > 0.95
