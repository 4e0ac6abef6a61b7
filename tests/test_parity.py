"""Golden logit-parity: torch reference models vs JAX models with IMPORTED
torch weights, eval mode, fp32 tolerance (BASELINE.json:5, SURVEY.md §4.1)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from pointnet12_tpu.models import get_model
from pointnet12_tpu.utils import torch_import
from tests.torch_ref import models_torch


def _numpy_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _warm_bn(model, make_input, steps=3):
    """Run a few train-mode forwards so running stats are nontrivial."""
    model.train()
    with torch.no_grad():
        for i in range(steps):
            torch.manual_seed(i)
            model(make_input(i))
    model.eval()


@pytest.mark.parametrize("feature_transform", [False, True])
def test_pointnet_cls_logit_parity(feature_transform):
    torch.manual_seed(0)
    tmodel = models_torch.PointNetCls(
        num_classes=10, feature_transform=feature_transform
    )
    _warm_bn(tmodel, lambda i: torch.randn(4, 3, 128))

    rng = np.random.RandomState(7)
    pts = rng.randn(4, 128, 3).astype(np.float32)
    with torch.no_grad():
        want, _ = tmodel(torch.from_numpy(pts).permute(0, 2, 1))

    variables = torch_import.convert_pointnet_cls(
        _numpy_sd(tmodel), feature_transform
    )
    model = get_model(
        "pointnet_cls", num_classes=10, feature_transform=feature_transform
    )
    got, _ = model.apply(
        {k: v for k, v in variables.items()}, jnp.asarray(pts), train=False
    )
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), atol=2e-4, rtol=2e-4
    )


def test_pointnet_seg_logit_parity():
    torch.manual_seed(1)
    tmodel = models_torch.PointNetSeg(num_classes=7)
    _warm_bn(tmodel, lambda i: torch.randn(4, 3, 128))

    rng = np.random.RandomState(8)
    pts = rng.randn(2, 128, 3).astype(np.float32)
    with torch.no_grad():
        want, _ = tmodel(torch.from_numpy(pts).permute(0, 2, 1))

    variables = torch_import.convert_pointnet_seg(_numpy_sd(tmodel))
    model = get_model("pointnet_seg", num_classes=7)
    got, _ = model.apply(variables, jnp.asarray(pts), train=False)
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), atol=2e-4, rtol=2e-4
    )


@pytest.mark.parametrize("variant", ["ssg", "msg"])
def test_pointnet2_cls_logit_parity(variant):
    torch.manual_seed(3)
    if variant == "ssg":
        tmodel = models_torch.PointNet2ClsSsg(num_classes=10)
        convert = torch_import.convert_pointnet2_cls_ssg
        jname = "pointnet2_cls_ssg"
    else:
        tmodel = models_torch.PointNet2ClsMsg(num_classes=10)
        convert = torch_import.convert_pointnet2_cls_msg
        jname = "pointnet2_cls_msg"
    _warm_bn(tmodel, lambda i: torch.rand(2, 512, 3), steps=2)

    rng = np.random.RandomState(10)
    pts = rng.uniform(size=(2, 512, 3)).astype(np.float32)
    with torch.no_grad():
        want, _ = tmodel(torch.from_numpy(pts))

    variables = convert({k: v.numpy() for k, v in tmodel.state_dict().items()})
    model = get_model(jname, num_classes=10, impl="jnp")
    got, _ = model.apply(variables, jnp.asarray(pts), train=False)

    err = np.abs(np.asarray(got) - want.numpy())
    # boundary flips may perturb a neighborhood or two; quantile-tight
    assert np.quantile(err, 0.95) < 1e-3, np.quantile(err, 0.95)
    assert np.median(err) < 2e-4


def test_pointnet2_semseg_logit_parity():
    """Full PointNet++ seg stack: FPS + ball query + SA + FP must all agree
    (deterministic FPS start=0 both sides)."""
    torch.manual_seed(2)
    tmodel = models_torch.PointNet2SemSeg(num_classes=6, channel=9)
    # unit-cube clouds so ball-query radii are meaningful
    _warm_bn(
        tmodel,
        lambda i: torch.rand(2, 1024, 9),
        steps=2,
    )

    rng = np.random.RandomState(9)
    pts = rng.uniform(size=(2, 1024, 9)).astype(np.float32)
    with torch.no_grad():
        want, _ = tmodel(torch.from_numpy(pts))

    variables = torch_import.convert_pointnet2_semseg(_numpy_sd(tmodel))
    model = get_model("pointnet2_semseg", num_classes=6, impl="jnp")
    got, _ = model.apply(variables, jnp.asarray(pts), train=False)

    got = np.asarray(got)
    want = want.numpy()
    # Radius-boundary fp flips can reroute a handful of points through
    # different neighbor sets; demand near-exact agreement on >=99% of
    # points and tight agreement in quantile.
    err = np.abs(got - want).max(axis=-1)  # (B, N)
    assert np.quantile(err, 0.99) < 1e-3, (
        f"99th-pct logit error {np.quantile(err, 0.99)}"
    )
    assert np.median(err) < 1e-4
