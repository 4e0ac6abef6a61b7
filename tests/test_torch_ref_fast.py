"""Equivalence of the torch oracle's FAST_MLP execution path.

tests/torch_ref/models_torch.py::FAST_MLP runs the SA/FP conv stacks
channels-last via matmul + F.batch_norm instead of permute + Conv2d +
BatchNorm2d. Same modules, same parameters, same BN statistics semantics;
only fp32 accumulation order differs — which is enough to flip max-pool
argmaxes at fp32 near-ties and reroute gradients (the same intrinsic chaos
documented in tests/test_train_parity.py). The decisive equivalence check
therefore runs in float64, where roundoff shrinks ~1e9x and the two paths
must agree to machine precision on outputs, gradients, AND train-mode BN
running-statistic updates; a separate fp32 check pins the forward/eval
paths (no argmax-routing in the value path) at fp32 tolerance.
"""

import copy

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tests.torch_ref import models_torch


@pytest.fixture
def f64_default():
    torch.set_default_dtype(torch.float64)
    yield
    torch.set_default_dtype(torch.float32)


def _run_both(make_model, run):
    torch.manual_seed(0)
    m_fast = make_model()
    m_ref = copy.deepcopy(m_fast)
    models_torch.FAST_MLP = True
    try:
        out_fast = run(m_fast)
    finally:
        models_torch.FAST_MLP = False
    try:
        out_ref = run(m_ref)
    finally:
        models_torch.FAST_MLP = True
    return m_fast, m_ref, out_fast, out_ref


def _assert_state_close(m_fast, m_ref, rtol, atol):
    sd_f, sd_r = m_fast.state_dict(), m_ref.state_dict()
    assert sd_f.keys() == sd_r.keys()
    for k in sd_f:
        np.testing.assert_allclose(
            sd_f[k].detach().numpy(),
            sd_r[k].detach().numpy(),
            rtol=rtol, atol=atol, err_msg=k,
        )


@pytest.mark.parametrize("group_all", [False, True])
def test_set_abstraction_fast_path_matches_f64(f64_default, group_all):
    xyz = torch.randn(2, 128, 3)
    pts = torch.randn(2, 128, 6)

    def make():
        if group_all:
            return models_torch.SetAbstraction(
                None, None, None, 6 + 3, [16, 32], group_all=True
            )
        return models_torch.SetAbstraction(
            32, 0.4, 16, 6 + 3, [16, 32], group_all=False
        )

    def run(m):
        m.train()
        _, out = m(xyz, pts)
        out.sum().backward()
        grads = [p.grad.clone() for p in m.parameters()]
        m.eval()
        with torch.no_grad():
            _, out_eval = m(xyz, pts)
        return out, grads, out_eval

    m_fast, m_ref, (o_f, g_f, e_f), (o_r, g_r, e_r) = _run_both(make, run)
    np.testing.assert_allclose(
        o_f.detach().numpy(), o_r.detach().numpy(), rtol=1e-12, atol=1e-12
    )
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(
            a.numpy(), b.numpy(), rtol=1e-9, atol=1e-10
        )
    # train-mode BN running-stat updates identical (EMA + unbiased var)
    _assert_state_close(m_fast, m_ref, rtol=1e-12, atol=1e-14)
    # eval path (folded running stats) identical too
    np.testing.assert_allclose(
        e_f.numpy(), e_r.numpy(), rtol=1e-12, atol=1e-12
    )


def test_msg_and_fp_fast_path_matches_f64(f64_default):
    xyz = torch.randn(2, 128, 3)
    pts = torch.randn(2, 128, 6)

    def make():
        return models_torch.SetAbstractionMsg(
            32, [0.2, 0.4], [8, 16], 6, [[16, 16], [16, 32]]
        )

    def run(m):
        m.train()
        _, out = m(xyz, pts)
        out.sum().backward()
        return out, [p.grad.clone() for p in m.parameters()]

    m_fast, m_ref, (o_f, g_f), (o_r, g_r) = _run_both(make, run)
    np.testing.assert_allclose(
        o_f.detach().numpy(), o_r.detach().numpy(), rtol=1e-12, atol=1e-12
    )
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(a.numpy(), b.numpy(), rtol=1e-9,
                                   atol=1e-10)
    _assert_state_close(m_fast, m_ref, rtol=1e-12, atol=1e-14)

    # FeaturePropagation (Conv1d stack)
    xyz1, xyz2 = torch.randn(2, 64, 3), torch.randn(2, 16, 3)
    p1, p2 = torch.randn(2, 64, 8), torch.randn(2, 16, 12)

    def make_fp():
        return models_torch.FeaturePropagation(8 + 12, [16, 16])

    def run_fp(m):
        m.train()
        out = m(xyz1, xyz2, p1, p2)
        out.sum().backward()
        return out, [p.grad.clone() for p in m.parameters()]

    m_fast, m_ref, (o_f, g_f), (o_r, g_r) = _run_both(make_fp, run_fp)
    np.testing.assert_allclose(
        o_f.detach().numpy(), o_r.detach().numpy(), rtol=1e-12, atol=1e-12
    )
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(a.numpy(), b.numpy(), rtol=1e-9,
                                   atol=1e-10)
    _assert_state_close(m_fast, m_ref, rtol=1e-12, atol=1e-14)


def test_full_model_forward_matches_f64(f64_default):
    """Whole-model statement on PointNet2ClsSsg: train-mode logits (batch
    BN stats + aligned dropout masks), eval-mode logits after the stat
    update, and the updated state all agree to f64 machine precision.
    (In fp32 the two accumulation orders diverge visibly — ~4e-2 on
    train logits here — via near-tie amplification through 9 train-mode
    BNs and 3 max-pools; that is the documented intrinsic chaos, which is
    why the decisive equivalence bar is f64.)"""
    torch.manual_seed(0)
    pts = torch.randn(4, 512, 3)

    def make():
        return models_torch.PointNet2ClsSsg(num_classes=8)

    def run(m):
        torch.manual_seed(7)  # align the cls head's dropout masks
        m.train()
        logp, _ = m(pts)
        m.eval()
        with torch.no_grad():
            logp_eval, _ = m(pts)
        return logp.detach(), logp_eval

    m_fast, m_ref, (tr_f, ev_f), (tr_r, ev_r) = _run_both(make, run)
    np.testing.assert_allclose(tr_f.numpy(), tr_r.numpy(), rtol=1e-9,
                               atol=1e-10)
    np.testing.assert_allclose(ev_f.numpy(), ev_r.numpy(), rtol=1e-9,
                               atol=1e-10)
    _assert_state_close(m_fast, m_ref, rtol=1e-10, atol=1e-12)
