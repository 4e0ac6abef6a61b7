"""AOT serving export: jax.export artifact round-trips and matches live."""

import numpy as np
import pytest

import jax

from pointnet12_tpu.infer import Predictor, load_exported
from pointnet12_tpu.models import get_model
from pointnet12_tpu.train import (
    CheckpointManager,
    create_train_state,
    make_optimizer,
)


def _small_predictor(num_classes=4):
    model = get_model("pointnet_cls", num_classes=num_classes)
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (2, 128, 3))
    state = create_train_state(model, key, pts[:1], make_optimizer())
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return Predictor(model, variables), pts


def test_export_roundtrip_matches_live_forward():
    p, pts = _small_predictor()
    blob = p.export_serialized(batch_size=2, num_points=128)
    assert isinstance(blob, bytes) and len(blob) > 0

    q = load_exported(blob)
    assert q.input_shape == (2, 128, 3)
    np.testing.assert_allclose(
        np.asarray(q(pts)), np.asarray(p(pts)), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_array_equal(q.predict_labels(pts), p.predict_labels(pts))


def test_export_semseg_to_file(tmp_path):
    model = get_model("pointnet2_semseg", num_classes=5)
    key = jax.random.PRNGKey(1)
    pts = jax.random.uniform(key, (2, 1024, 3))
    state = create_train_state(model, key, pts[:1], make_optimizer())
    p = Predictor(
        model, {"params": state.params, "batch_stats": state.batch_stats}
    )

    path = tmp_path / "semseg.stablehlo"
    p.save_exported(path, batch_size=2, num_points=1024)
    q = load_exported(path)
    assert q.input_shape == (2, 1024, 3)
    out = q(pts)
    assert out.shape == (2, 1024, 5)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(p(pts)), atol=1e-5, rtol=1e-5
    )


def test_export_cli_from_checkpoint(tmp_path):
    model = get_model("pointnet_cls", num_classes=4)
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (2, 128, 3))
    state = create_train_state(model, key, pts[:1], make_optimizer())
    ckpt_dir = tmp_path / "ckpt"
    mgr = CheckpointManager(str(ckpt_dir))
    mgr.save(0, state, metrics={"score": 0.0})
    mgr.wait()

    from pointnet12_tpu.cli import export as export_cli

    out = tmp_path / "cls.stablehlo"
    export_cli.main([
        "--model_name", "pointnet_cls",
        "--checkpoint", str(ckpt_dir),
        "--num_classes", "4",
        "--batchsize", "2",
        "--num_point", "128",
        "--out", str(out),
    ])
    q = load_exported(out)
    live = Predictor.from_checkpoint(
        "pointnet_cls", str(ckpt_dir), num_classes=4
    )
    np.testing.assert_allclose(
        np.asarray(q(pts)), np.asarray(live(pts)), atol=1e-5, rtol=1e-5
    )


def test_export_rejects_mesh_predictor():
    from pointnet12_tpu.parallel.mesh import make_mesh

    model = get_model("pointnet_cls", num_classes=4)
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (2, 128, 3))
    state = create_train_state(model, key, pts[:1], make_optimizer())
    p = Predictor(
        model,
        {"params": state.params, "batch_stats": state.batch_stats},
        mesh=make_mesh(),
    )
    with pytest.raises(ValueError, match="mesh"):
        p.export_serialized(batch_size=2, num_points=128)
