"""Training-path parity vs the torch oracle (VERDICT #5).

Same init (torch weights converted), same batches, same plain-SGD LR, both
sides in train mode (BN batch-stats normalization, dropout disabled,
deterministic FPS start). Three layers of evidence, strongest first:

1. GRADIENT parity at init — deterministic, tight (fp32 tolerance): the
   full backward (max-pool routing, BN-train backward, T-Net bmm) matches.
2. Loss trajectory for the first few steps — tight.
3. Longer trajectory — loose band only: fp32 noise amplifies chaotically
   through argmax flips in the max-pools (measured: ~1e-5 at step 2 can
   become ~1e-1 by step 15 on CPU), so exact long-horizon tracking is
   impossible in principle; we assert the trajectories stay close in
   aggregate, not stepwise.

This is the strongest achievable stand-in for the reference's 0.5%
end-accuracy target on a box with no datasets (SURVEY.md §6).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp
import optax

from pointnet12_tpu.models import get_model
from pointnet12_tpu.train import losses as losses_lib
from pointnet12_tpu.utils.torch_import import CONVERTERS
from tests.torch_ref import models_torch


@pytest.fixture(autouse=True)
def _naive_oracle_path():
    """Pin the oracle to its naive Conv2d/BatchNorm2d execution path.

    The thresholds here were calibrated against that path (rounds 1-3);
    FAST_MLP's channels-last matmul changes only fp32 accumulation order,
    but radius-boundary ball-query membership flips amplify that roundoff
    into sparse few-percent grad diffs (measured: semseg grad cosine
    0.9952 vs the 0.999 gate with FAST_MLP on). The fast path's own
    equivalence gate is tests/test_torch_ref_fast.py (f64)."""
    prev = models_torch.FAST_MLP
    models_torch.FAST_MLP = False
    yield
    models_torch.FAST_MLP = prev

LR = 0.01
KEY = jax.random.PRNGKey(0)


def _disable_dropout(module):
    for m in module.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0


def _state_dict_np(tmodel):
    return {
        k: v.numpy()
        for k, v in tmodel.state_dict().items()
        if "num_batches_tracked" not in k
    }


def _jax_loss_fn(model, bs, pts, lbl):
    def loss_fn(p):
        (logp, _), mut = model.apply(
            {"params": p, "batch_stats": bs},
            pts,
            train=True,
            fps_key=None,  # deterministic FPS start (torch oracle: start=0)
            mutable=["batch_stats"],
            rngs={"dropout": KEY},
        )
        return losses_lib.nll_loss(logp, lbl), mut["batch_stats"]

    return loss_fn


def _torch_grads_as_flax(tmodel, model_name, conv_kwargs=None):
    """Route torch .grad tensors through the weight converter so they land
    in the flax tree layout (gradients transform exactly like weights)."""
    gsd = _state_dict_np(tmodel)  # stats stay as values (unused below)
    for k, p in tmodel.named_parameters():
        gsd[k] = p.grad.detach().numpy()
    return CONVERTERS[model_name](gsd, **(conv_kwargs or {}))["params"]


def _run_jax(model, variables, batches, labels):
    params, bs = variables["params"], variables["batch_stats"]
    tx = optax.sgd(LR)
    opt = tx.init(params)
    losses = []

    @jax.jit
    def step(params, bs, opt, pts, lbl):
        (loss, new_bs), grads = jax.value_and_grad(
            _jax_loss_fn(model, bs, pts, lbl), has_aux=True
        )(params)
        updates, new_opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    for pts, lbl in zip(batches, labels):
        params, bs, opt, loss = step(
            params, bs, opt, jnp.asarray(pts), jnp.asarray(lbl)
        )
        losses.append(float(loss))
    return losses


def _torch_in(pts, channels_first):
    t = torch.from_numpy(pts)
    return t.permute(0, 2, 1) if channels_first else t


def _run_torch(tmodel, batches, labels, channels_first=True):
    tmodel.train()
    optim = torch.optim.SGD(tmodel.parameters(), lr=LR, momentum=0.0)
    losses = []
    for pts, lbl in zip(batches, labels):
        optim.zero_grad()
        logp, _ = tmodel(_torch_in(pts, channels_first))
        loss = F.nll_loss(
            logp.reshape(-1, logp.shape[-1]),
            torch.from_numpy(lbl).long().reshape(-1),
        )
        loss.backward()
        optim.step()
        losses.append(float(loss.detach()))
    return losses


def _assert_grad_parity(jgrads, tgrads, rtol=2e-4, atol=5e-5):
    """atol floor: conv biases directly before train-mode BN have a TRUE
    gradient of exactly 0 (mean subtraction cancels the bias), so both
    sides produce ~1e-8 numerical noise — relative error is meaningless
    there; atol covers it."""
    import jax.tree_util as jtu

    for (path, a), (_, b) in zip(
        jtu.tree_flatten_with_path(jgrads)[0],
        jtu.tree_flatten_with_path(tgrads)[0],
    ):
        a, b = np.asarray(a), np.asarray(b)
        err = np.max(np.abs(a - b))
        bound = atol + rtol * np.max(np.abs(b))
        assert err < bound, (
            f"grad mismatch at {jtu.keystr(path)}: {err:.2e} > {bound:.2e}"
        )


def _assert_grad_parity_global(jgrads, tgrads, cos_min=0.999,
                               l2rel_max=0.05):
    """Global flattened-vector comparison for models where per-element
    tolerance is the wrong metric: near-tie argmax flips in a max-pool
    (global 1024-point max, or SA K-max) reroute whole channels' gradients
    between fp-equivalent inputs, producing sparse large element diffs
    that carry no signal about correctness."""
    from jax.flatten_util import ravel_pytree

    ja = np.asarray(ravel_pytree(jgrads)[0])
    ta = np.asarray(ravel_pytree(tgrads)[0])
    cos = np.dot(ja, ta) / (np.linalg.norm(ja) * np.linalg.norm(ta))
    l2rel = np.linalg.norm(ja - ta) / np.linalg.norm(ta)
    assert cos > cos_min, f"gradient cosine similarity {cos}"
    assert l2rel < l2rel_max, f"gradient L2 relative error {l2rel}"


def _grad_parity_case(tmodel, model_name, model, pts, lbl,
                      channels_first=True, conv_kwargs=None,
                      metric="elementwise"):
    variables = CONVERTERS[model_name](
        _state_dict_np(tmodel), **(conv_kwargs or {})
    )
    (_, _), jgrads = jax.value_and_grad(
        _jax_loss_fn(model, variables["batch_stats"], jnp.asarray(pts),
                     jnp.asarray(lbl)),
        has_aux=True,
    )(variables["params"])

    tmodel.train()
    logp, _ = tmodel(_torch_in(pts, channels_first))
    loss = F.nll_loss(
        logp.reshape(-1, logp.shape[-1]),
        torch.from_numpy(lbl).long().reshape(-1),
    )
    loss.backward()
    tgrads = _torch_grads_as_flax(tmodel, model_name, conv_kwargs)
    if metric == "global":
        _assert_grad_parity_global(jgrads, tgrads)
    else:
        _assert_grad_parity(jgrads, tgrads)


def test_grad_parity_pointnet_cls():
    torch.manual_seed(0)
    tmodel = models_torch.PointNetCls(num_classes=5)
    _disable_dropout(tmodel)
    model = get_model("pointnet_cls", num_classes=5, dropout_rate=0.0)
    rng = np.random.RandomState(0)
    _grad_parity_case(
        tmodel, "pointnet_cls", model,
        rng.randn(8, 256, 3).astype(np.float32), rng.randint(0, 5, 8),
    )


def test_grad_parity_pointnet_seg():
    """BASELINE config 2 at its reference settings (9-channel input,
    feature_transform=True — both T-Nets active). Added in round 4: this
    was the only model family without a grad-parity case, and its
    quality-parity run needed the init-equivalence fact to attribute a
    failed 240-step comparison to trajectory chaos (global 1024-point max
    + two T-Nets) rather than a bug — measured init loss delta 5e-7,
    grad correlation 0.99999 at the full case shape.

    Compared as a GLOBAL vector (like the pointnet2 case): the global
    max-pool has near-tie argmax flips between fp-equivalent channels,
    which reroute whole channels' gradients — measured 4e-4 max element
    diff on feat.conv1.kernel with cosine 0.99999+, exactly the
    signature the global metric exists for."""
    torch.manual_seed(4)
    tmodel = models_torch.PointNetSeg(
        num_classes=6, feature_transform=True, channel=9
    )
    _disable_dropout(tmodel)
    model = get_model("pointnet_seg", num_classes=6, feature_transform=True)
    rng = np.random.RandomState(4)
    _grad_parity_case(
        tmodel, "pointnet_seg", model,
        rng.randn(4, 512, 9).astype(np.float32),
        rng.randint(0, 6, (4, 512)),
        conv_kwargs={"feature_transform": True},
        metric="global",
    )


def test_grad_parity_pointnet2_semseg():
    """PointNet++ gradients are compared as a GLOBAL flattened vector, not
    per-element: ball-query membership legitimately flips for points within
    fp tolerance of a radius boundary (expansion-form vs direct-form d² —
    same effect the kernel tests mask out), which produces sparse few-percent
    element diffs in SA kernels. Cosine/L2 agreement of the full gradient is
    the meaningful metric; calibrated: cos≈0.99973, L2rel≈2.3e-2."""
    torch.manual_seed(1)
    tmodel = models_torch.PointNet2SemSeg(num_classes=6, channel=9)
    _disable_dropout(tmodel)
    model = get_model(
        "pointnet2_semseg", num_classes=6, dropout_rate=0.0, impl="jnp"
    )
    rng = np.random.RandomState(1)
    pts = rng.rand(2, 1024, 9).astype(np.float32)
    lbl = rng.randint(0, 6, (2, 1024))

    variables = CONVERTERS["pointnet2_semseg"](_state_dict_np(tmodel))
    (_, _), jgrads = jax.value_and_grad(
        _jax_loss_fn(model, variables["batch_stats"], jnp.asarray(pts),
                     jnp.asarray(lbl)),
        has_aux=True,
    )(variables["params"])

    tmodel.train()
    logp, _ = tmodel(_torch_in(pts, channels_first=False))
    loss = F.nll_loss(
        logp.reshape(-1, 6), torch.from_numpy(lbl).long().reshape(-1)
    )
    loss.backward()
    tgrads = _torch_grads_as_flax(tmodel, "pointnet2_semseg")
    _assert_grad_parity_global(jgrads, tgrads)


def test_trajectory_parity_pointnet_cls():
    torch.manual_seed(0)
    tmodel = models_torch.PointNetCls(num_classes=5)
    _disable_dropout(tmodel)
    variables = CONVERTERS["pointnet_cls"](_state_dict_np(tmodel))
    model = get_model("pointnet_cls", num_classes=5, dropout_rate=0.0)

    rng = np.random.RandomState(0)
    batches = [rng.randn(8, 256, 3).astype(np.float32) for _ in range(20)]
    labels = [rng.randint(0, 5, 8) for _ in range(20)]

    got = _run_jax(model, variables, batches, labels)
    want = _run_torch(tmodel, batches, labels)
    # tight for the first steps (before fp32 chaos amplifies)...
    np.testing.assert_allclose(got[:3], want[:3], atol=1e-3)
    # ...loose in aggregate for the rest (see module docstring)
    assert np.all(np.isfinite(got)) and np.all(np.isfinite(want))
    assert np.mean(np.abs(np.array(got) - np.array(want))) < 0.15
    assert abs(want[-1] - want[0]) > 1e-3  # training actually moved


def test_trajectory_parity_pointnet2_semseg():
    torch.manual_seed(1)
    tmodel = models_torch.PointNet2SemSeg(num_classes=6, channel=9)
    _disable_dropout(tmodel)
    variables = CONVERTERS["pointnet2_semseg"](_state_dict_np(tmodel))
    model = get_model(
        "pointnet2_semseg", num_classes=6, dropout_rate=0.0, impl="jnp"
    )

    rng = np.random.RandomState(1)
    n_steps = 8  # PointNet++ on CPU is slow; 8 steps is plenty
    batches = [rng.rand(2, 1024, 9).astype(np.float32) for _ in range(n_steps)]
    labels = [rng.randint(0, 6, (2, 1024)) for _ in range(n_steps)]

    got = _run_jax(model, variables, batches, labels)
    want = _run_torch(tmodel, batches, labels, channels_first=False)
    # 2 tight steps for PointNet++: its deeper reduce chains (+ the lifted
    # first matmul's fp reassociation) amplify fp32 noise a step sooner
    np.testing.assert_allclose(got[:2], want[:2], atol=3e-3)
    assert np.all(np.isfinite(got)) and np.all(np.isfinite(want))
    assert np.mean(np.abs(np.array(got) - np.array(want))) < 0.15
